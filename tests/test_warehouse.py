"""Warehouse layout tests: dynamic partition overwrite replaces only the
written partitions; partition filters prune at plan time; bucketed joins
run without exchanges on either side."""

import os

import pytest
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.sources.warehouse import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "by_year")
    df = spark.createDataFrame(
        [(2020, "a", 1.0), (2021, "b", 2.0)], ["year", "k", "v"]
    )
    write_partitioned(df, path, ["year"])
    # re-write ONLY 2021 with new data; 2020 must survive
    df2 = spark.createDataFrame([(2021, "b2", 9.0)], ["year", "k", "v"])
    write_partitioned(df2, path, ["year"])
    got = {(r["year"], r["k"]) for r in read_partitioned(spark, path).collect()}
    assert got == {(2020, "a"), (2021, "b2")}
    # static overwrite would have dropped 2020 entirely
    assert os.path.isdir(os.path.join(path, "year=2020"))


def test_partition_pruning_visible_in_plan(spark, tmp_path):
    path = str(tmp_path / "pruned")
    df = spark.range(100).select(
        (F.col("id") % 4).alias("year"), F.col("id").alias("v")
    )
    write_partitioned(df, path, ["year"])
    scan = read_partitioned(spark, path).filter(F.col("year") == 2)
    plan = phys(scan)
    assert "PartitionFilters" in plan and "year" in plan.split("PartitionFilters")[1][:120]
    assert scan.count() == 25


def test_partition_evolution_prunes_each_era_by_its_own_spec(spark, tmp_path):
    """Iceberg spec-evolution rule on plain parquet eras: a predicate on
    the NEW partition key prunes directories in the new era and pushes
    into the parquet scan as a row filter in the old era — two scans,
    each pruned under its own spec, no rewrite of history."""
    from shared_etl_pipelines_spark.sources.warehouse import (
        read_evolved,
        write_partition_era,
    )

    path = str(tmp_path / "evolved")
    df = spark.range(200).select(
        (F.col("id") % 4).alias("year"),
        F.concat(F.lit("p"), (F.col("id") % 3)).alias("pri"),
        F.col("id").alias("v"),
    )
    assert write_partition_era(df.filter(F.col("year") < 2), path, ["year"]) == 0
    assert (
        write_partition_era(df.filter(F.col("year") >= 2), path, ["year", "pri"])
        == 1
    )
    scan = read_evolved(spark, path).filter(
        (F.col("year") == 2) & (F.col("pri") == "p1")
    )
    plan = phys(scan)
    # the plan's Location strings truncate under long tmp paths, so the
    # two era scans are identified by their filter SHAPE instead: in the
    # new era pri is a partition key (directory pruning), in the old era
    # it is a data column (pushed row filter) — exactly one scan each.
    scans = [s for s in plan.split("FileScan") if "PartitionFilters" in s]
    assert len(scans) == 2
    part_f = [s.split("PartitionFilters")[1].split("]")[0] for s in scans]
    push_f = [s.split("PushedFilters")[1].split("]")[0] for s in scans]
    pruned = [i for i in range(2) if "pri" in part_f[i]]
    pushed = [i for i in range(2) if "EqualTo(pri,p1)" in push_f[i]]
    assert len(pruned) == 1 and len(pushed) == 1 and pruned != pushed
    # year is a partition key in BOTH eras -> pruned in both scans
    assert all("year" in p for p in part_f)
    # semantics: union equals the direct filter on the source frame
    want = sorted(
        r["v"]
        for r in df.filter((F.col("year") == 2) & (F.col("pri") == "p1")).collect()
    )
    got = sorted(r["v"] for r in scan.collect())
    assert got == want
    # type drift (bare-numeric partition values re-inferred as int) fails loud
    import pytest as _pytest

    path2 = str(tmp_path / "drift")
    df2 = df.withColumn("pri", (F.col("v") % 3).cast("string"))
    write_partition_era(df2.filter(F.col("year") < 2), path2, ["year"])
    write_partition_era(df2.filter(F.col("year") >= 2), path2, ["year", "pri"])
    with _pytest.raises(TypeError, match="type drift"):
        read_evolved(spark, path2)


def test_bucketed_join_no_exchange(spark, tmp_path):
    big = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(big, "wb_big", ["k"], 8, sort_cols=["k"], path=str(tmp_path / "b1"))
    write_bucketed(dim, "wb_dim", ["k"], 8, sort_cols=["k"], path=str(tmp_path / "b2"))
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("wb_big").join(spark.table("wb_dim"), on="k")
        plan = phys(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: neither side shuffles
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS wb_big")
        spark.sql("DROP TABLE IF EXISTS wb_dim")


def test_compact_partition_preserves_rows_and_swaps_atomically(spark, tmp_path):
    from shared_etl_pipelines_spark.sources.warehouse import compact_partition

    path = str(tmp_path / "many_small")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS g")
    df.repartition(40).write.parquet(path)  # 40 tiny files

    import os
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 40

    res = compact_partition(spark, path, target_bytes=10**9)  # fits in 1 file
    assert res["files_before"] == n_before
    assert res["files_after"] == 1

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id)").collect()[0][0] == sum(range(10_000))
    # no temp/old dirs left behind
    assert not any("._compact" in d for d in os.listdir(str(tmp_path)))

    # already-compact data is a no-op (no rewrite when n_out >= n_files)
    res2 = compact_partition(spark, path, target_bytes=10**9)
    assert res2["files_after"] == res2["files_before"] == 1


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Joining a partitioned fact with a FILTERED dim on the partition
    column must inject a dynamic pruning subquery into the fact scan —
    at 100 TB this is the difference between scanning 1 partition and
    scanning all of them when the partition predicate only exists on
    the dimension side."""
    path = str(tmp_path / "dpp_fact")
    fact = spark.range(2000).selectExpr("id % 8 AS yr", "id AS v")
    write_partitioned(fact, path, ["yr"])
    dim = spark.createDataFrame(
        [(y, "keep" if y == 3 else "drop") for y in range(8)], ["yr", "flag"]
    )
    joined = (
        read_partitioned(spark, path)
        .join(dim.filter(F.col("flag") == "keep"), on="yr")
        .agg(F.sum("v").alias("s"))
    )
    plan = phys(joined)
    assert "dynamicpruningexpression" in plan.lower()
    assert joined.collect()[0]["s"] == sum(v for v in range(2000) if v % 8 == 3)


def test_runtime_bloom_filter_prunes_shuffle_join_probe_side(spark, tmp_path):
    """With broadcast off (the beyond-threshold regime), a selective
    filter on one join side should inject a runtime bloom filter on the
    probe side so most fact rows drop before the shuffle. Thresholds are
    sized for real clusters (10 GB scans), so the test lowers them to
    prove the posture engages; results must be identical either way."""
    big_path = str(tmp_path / "bloom_big")
    dim_path = str(tmp_path / "bloom_dim")
    spark.range(50_000).selectExpr("id AS k", "id * 2 AS v").write.parquet(big_path)
    spark.range(1000).selectExpr("id AS k", "id % 50 AS grp").write.parquet(dim_path)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.read.parquet(big_path)
        dim = spark.read.parquet(dim_path).filter(F.col("grp") == 7)
        joined = big.join(dim, on="k").agg(F.sum("v").alias("s"))
        plan = phys(joined)
        assert "might_contain" in plan.lower()  # bloom probe on the big side
        expect = sum(2 * k for k in range(1000) if k % 50 == 7)
        assert joined.collect()[0]["s"] == expect
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    must SortMergeJoin with ZERO Exchange operators — the co-located
    big-x-big join path the write layout buys at ingest."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.operators.layout import write_bucketed_table

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 4, ["o_orderkey"])
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 4, ["l_orderkey"])
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        # broadcast would hide the property at this SF: force SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = a.join(b, a["o_orderkey"] == b["l_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_extendedprice").alias("rev"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself sees NO exchange: buckets are pre-shuffled.
        # (the groupBy after it may still exchange — split the plan at
        # the join and inspect its subtree: both children scan buckets)
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange hashpartitioning" not in join_part
        assert j.count() > 0  # and it actually runs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_mor_table_matches_copy_on_write_semantics(spark, tmp_path):
    """Merge-on-read state after delete/upsert/reinsert batches equals
    the hand-computed final state; same-batch delete+upsert keeps the
    upsert; compaction preserves state and drops the tombstone dir."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_compact,
        mor_read,
        mor_write_base,
    )

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], ["k", "val"]
    )
    path = str(tmp_path / "mor")
    mor_write_base(base, path)
    # batch 1: delete evens; upsert multiples of 3 (includes evens 6, 12, 18)
    s1 = mor_apply_changes(
        spark, path, ["k"],
        upserts=base.filter(F.col("k") % 3 == 0).select(
            "k", F.concat(F.lit("u"), F.col("k")).alias("val")
        ),
        delete_keys=base.filter(F.col("k") % 2 == 0).select("k"),
    )
    assert s1["seq"] == 1
    # batch 2: reinsert key 4 (deleted in batch 1)
    s2 = mor_apply_changes(
        spark, path, ["k"],
        upserts=spark.createDataFrame([(4, "back")], ["k", "val"]),
    )
    assert s2["seq"] == 2

    def state():
        return {r["k"]: r["val"] for r in mor_read(spark, path, ["k"]).collect()}

    want = {}
    for i in range(20):
        if i == 4:
            want[i] = "back"
        elif i % 3 == 0:
            want[i] = f"u{i}"  # same-batch delete+upsert: upsert wins
        elif i % 2 == 0:
            continue  # deleted
        else:
            want[i] = f"v{i}"
    assert state() == want
    c = mor_compact(spark, path, ["k"])
    assert c["live_rows"] == len(want)
    assert not os.path.exists(os.path.join(path, "_deletes"))
    assert state() == want


def test_mor_bucketed_matches_path_based_semantics(spark, tmp_path):
    """The bucketed MoR twin must reproduce the path-based state machine
    exactly: same delete/upsert/reinsert batches, same final state, and
    compaction preserves state while dropping the tombstone table."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes_bucketed,
        mor_compact_bucketed,
        mor_create_bucketed,
        mor_read_bucketed,
    )

    tbl = "t_mor_bucketed_sem"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}__tombstones")
    try:
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], ["k", "val"]
        )
        mor_create_bucketed(base, tbl, ["k"], n_buckets=4)
        s1 = mor_apply_changes_bucketed(
            spark, tbl, ["k"],
            upserts=base.filter(F.col("k") % 3 == 0).select(
                "k", F.concat(F.lit("u"), F.col("k")).alias("val")
            ),
            delete_keys=base.filter(F.col("k") % 2 == 0).select("k"),
            n_buckets=4,
        )
        assert s1["seq"] == 1
        s2 = mor_apply_changes_bucketed(
            spark, tbl, ["k"],
            upserts=spark.createDataFrame([(4, "back")], ["k", "val"]),
            n_buckets=4,
        )
        assert s2["seq"] == 2

        def state():
            return {
                r["k"]: r["val"]
                for r in mor_read_bucketed(spark, tbl, ["k"]).collect()
            }

        want = {}
        for i in range(20):
            if i == 4:
                want[i] = "back"
            elif i % 3 == 0:
                want[i] = f"u{i}"
            elif i % 2 == 0:
                continue
            else:
                want[i] = f"v{i}"
        assert state() == want
        c = mor_compact_bucketed(spark, tbl, ["k"], n_buckets=4)
        assert c["live_rows"] == len(want)
        assert not spark.catalog.tableExists(f"{tbl}__tombstones")
        assert state() == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__tombstones")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__compacting")


def test_mor_bucketed_read_is_zero_exchange(spark, tmp_path):
    """The whole point of the bucketed layout: latest-per-key window AND
    tombstone merge consume the bucket distribution — no shuffle
    exchange anywhere in the read plan (VERDICT r5 #5)."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes_bucketed,
        mor_create_bucketed,
        mor_read_bucketed,
    )

    tbl = "t_mor_bucketed_plan"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}__tombstones")
    try:
        base = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        )
        mor_create_bucketed(base, tbl, ["k"], n_buckets=4)
        mor_apply_changes_bucketed(
            spark, tbl, ["k"],
            upserts=spark.range(50).select(
                F.col("id").alias("k"), F.lit(-1).cast("long").alias("val")
            ),
            delete_keys=spark.range(450, 500).select(F.col("id").alias("k")),
            n_buckets=4,
        )
        out = mor_read_bucketed(spark, tbl, ["k"])
        plan = phys(out)
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        # and it still answers correctly
        got = {r["k"]: r["val"] for r in out.collect()}
        assert len(got) == 450 and got[10] == -1 and got[100] == 200
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__tombstones")


def test_mor_writer_lock_fails_loud(spark, tmp_path):
    """Two concurrent change batches must not mint the same seq: the
    second writer hits the held lock and errors instead of silently
    masking rows; release unblocks it."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import acquire_fs_lock, release_fs_lock
    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_write_base,
    )

    path = str(tmp_path / "mor_locked")
    base = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("val"))
    mor_write_base(base, path)
    lock = path.rstrip("/") + ".mor.lock"
    acquire_fs_lock(spark, lock, owner="test-other-writer")
    up = spark.createDataFrame([(1, "y")], ["k", "val"])
    with _pytest.raises(RuntimeError, match="single-writer lock"):
        mor_apply_changes(spark, path, ["k"], upserts=up)
    release_fs_lock(spark, lock)
    s = mor_apply_changes(spark, path, ["k"], upserts=up)
    assert s["seq"] == 1
    # the writer released its own lock on the way out
    assert not os.path.exists(lock)


def test_mor_time_travel_snapshots(spark, tmp_path):
    """as_of_seq reads reproduce every historical state exactly: seq 0
    is the untouched base, seq 1 the post-batch-1 state (tombstones at
    later seqs invisible), newest-seq read == current read. The
    bucketed twin honors the same parameter."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_apply_changes_bucketed,
        mor_create_bucketed,
        mor_read,
        mor_read_bucketed,
        mor_write_base,
    )

    base = spark.createDataFrame([(i, f"v{i}") for i in range(12)], ["k", "val"])
    path = str(tmp_path / "mor_tt")
    mor_write_base(base, path)
    mor_apply_changes(
        spark, path, ["k"],
        upserts=base.filter(F.col("k") % 3 == 0).select(
            "k", F.concat(F.lit("u"), F.col("k")).alias("val")
        ),
        delete_keys=base.filter(F.col("k") % 2 == 0).select("k"),
    )
    mor_apply_changes(
        spark, path, ["k"],
        upserts=spark.createDataFrame([(4, "back")], ["k", "val"]),
        delete_keys=spark.createDataFrame([(3,)], ["k"]),
    )

    def snap(s=None):
        return {
            r["k"]: r["val"]
            for r in mor_read(spark, path, ["k"], as_of_seq=s).collect()
        }

    want0 = {i: f"v{i}" for i in range(12)}
    want1 = {
        i: (f"u{i}" if i % 3 == 0 else f"v{i}")
        for i in range(12)
        if i % 3 == 0 or i % 2 != 0
    }
    want2 = dict(want1)
    want2[4] = "back"
    del want2[3]
    assert snap(0) == want0
    assert snap(1) == want1
    assert snap(2) == want2
    assert snap(None) == want2  # newest == current

    tbl = "t_mor_tt_bucketed"
    for t in (tbl, f"{tbl}__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    mor_create_bucketed(base, tbl, ["k"], n_buckets=4)
    mor_apply_changes_bucketed(
        spark, tbl, ["k"],
        upserts=base.filter(F.col("k") % 3 == 0).select(
            "k", F.concat(F.lit("u"), F.col("k")).alias("val")
        ),
        delete_keys=base.filter(F.col("k") % 2 == 0).select("k"),
        n_buckets=4,
    )
    got1 = {
        r["k"]: r["val"]
        for r in mor_read_bucketed(spark, tbl, ["k"], as_of_seq=1).collect()
    }
    got0 = {
        r["k"]: r["val"]
        for r in mor_read_bucketed(spark, tbl, ["k"], as_of_seq=0).collect()
    }
    assert got1 == want1 and got0 == want0
    for t in (tbl, f"{tbl}__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_mor_changelog_ops(spark, tmp_path):
    """CDC contract: update carries the postimage, delete the preimage,
    reinsert-after-delete is an insert within its window but the whole
    0->2 range collapses delete+reinsert to one update (endpoint
    semantics); unchanged keys emit nothing."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_changelog,
        mor_write_base,
    )

    base = spark.createDataFrame([(i, f"v{i}") for i in range(8)], ["k", "val"])
    path = str(tmp_path / "mor_cdc")
    mor_write_base(base, path)
    # batch 1: update 0,3,6; delete 2,4 (0,6 not deleted: %2 keys kept odd here)
    mor_apply_changes(
        spark, path, ["k"],
        upserts=base.filter(F.col("k") % 3 == 0).select(
            "k", F.concat(F.lit("u"), F.col("k")).alias("val")
        ),
        delete_keys=spark.createDataFrame([(2,), (4,)], ["k"]),
    )
    # batch 2: reinsert 4, update 1
    mor_apply_changes(
        spark, path, ["k"],
        upserts=spark.createDataFrame([(4, "back"), (1, "u1")], ["k", "val"]),
    )

    def log(a, b):
        return {
            r["k"]: (r["_op"], r["val"])
            for r in mor_changelog(spark, path, ["k"], a, b).collect()
        }

    assert log(0, 1) == {
        0: ("update", "u0"),
        3: ("update", "u3"),
        6: ("update", "u6"),
        2: ("delete", "v2"),  # preimage
        4: ("delete", "v4"),
    }
    assert log(1, 2) == {4: ("insert", "back"), 1: ("update", "u1")}
    full = log(0, 2)
    assert full[4] == ("update", "back")  # delete+reinsert collapses
    assert full[2] == ("delete", "v2")
    assert 5 not in full and 7 not in full  # unchanged keys silent


def test_mor_history_and_schema_evolution(spark, tmp_path):
    """mor_history reports per-seq append/tombstone counts; a batch
    that adds a column reads back with merge_schema as the evolved
    schema, NULL on pre-evolution rows, and the changelog still works
    across the evolution boundary."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_changelog,
        mor_history,
        mor_read,
        mor_write_base,
    )

    base = spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["k", "val"])
    path = str(tmp_path / "mor_evo")
    mor_write_base(base, path)
    mor_apply_changes(
        spark, path, ["k"],
        upserts=spark.createDataFrame(
            [(1, "n1", "web"), (10, "n10", "app")], ["k", "val", "channel"]
        ),
        delete_keys=spark.createDataFrame([(9,)], ["k"]),
    )
    hist = {
        r["_seq"]: (r["rows_appended"], r["keys_tombstoned"])
        for r in mor_history(spark, path).collect()
    }
    assert hist == {0: (10, 0), 1: (2, 3)}  # tombstones: upsert keys 1,10 + delete 9

    state = mor_read(spark, path, ["k"], merge_schema=True)
    assert "channel" in state.columns
    rows = {r["k"]: (r["val"], r["channel"]) for r in state.collect()}
    assert rows[1] == ("n1", "web")
    assert rows[10] == ("n10", "app")
    assert rows[0] == ("v0", None)  # pre-evolution row: NULL default
    assert 9 not in rows

    ops = {
        r["k"]: (r["_op"], r["val"], r["channel"])
        for r in mor_changelog(spark, path, ["k"], 0, 1).collect()
    }
    assert ops[10] == ("insert", "n10", "app")
    assert ops[1] == ("update", "n1", "web")
    assert ops[9] == ("delete", "v9", None)  # preimage predates the column


def test_orc_scan_pushes_filter_and_prunes_columns(spark, tmp_path):
    """The ORC read path must push the date filter into the scan and
    prune the projection — a scan reading all columns for a 2-column
    aggregate is wrong at 100 TB regardless of the container format."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 3).alias("val"),
        F.concat(F.lit("pad"), F.col("id")).alias("padding"),
    )
    path = str(tmp_path / "orc_t")
    df.write.orc(path)
    q = (
        spark.read.orc(path)
        .filter(F.col("k") < 100)
        .groupBy("grp")
        .agg(F.sum("val").alias("s"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), LessThan(k,100)]" in plan
    # projection pruned: the pad column never reaches the scan schema
    assert "padding" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert q.count() == 7


def test_mor_asof_filter_reaches_the_scan(spark, tmp_path):
    """Time travel must prune at the scan, not post-fold: the
    _seq <= as_of filter has to appear in the parquet scan's pushed
    data filters so a snapshot read never shuffles rows newer than the
    snapshot."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_read,
        mor_write_base,
    )

    base = spark.createDataFrame([(i, i) for i in range(10)], ["k", "v"])
    path = str(tmp_path / "m")
    mor_write_base(base, path)
    mor_apply_changes(
        spark, path, ["k"],
        upserts=spark.createDataFrame([(1, 99)], ["k", "v"]),
    )
    plan = (
        mor_read(spark, path, ["k"], as_of_seq=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_lines = [l for l in plan.split("\n") if "FileScan parquet" in l]
    assert any("_seq" in l and "<= 0" in l for l in scan_lines), scan_lines


def test_mor_point_lookup_prunes_at_scan(spark, tmp_path):
    """A key predicate applied AFTER mor_read must reach the parquet
    scan: the latest-per-key window partitions by the key, so Catalyst
    pushes key filters through the fold — point lookups on a MoR table
    read only the matching rows, never the table."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_read,
        mor_write_base,
    )

    base = spark.createDataFrame([(i, i) for i in range(100)], ["k", "v"])
    path = str(tmp_path / "m")
    mor_write_base(base, path)
    mor_apply_changes(
        spark, path, ["k"],
        upserts=spark.createDataFrame([(1, 99)], ["k", "v"]),
        delete_keys=spark.createDataFrame([(7,)], ["k"]),
    )
    df = mor_read(spark, path, ["k"]).filter(F.col("k") == 9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        l for l in plan.split("\n")
        if "FileScan parquet" in l and "_deletes" not in l
    ]
    assert any("(k" in l and "= 9)" in l for l in scans), scans
    assert [r["v"] for r in df.collect()] == [9]
    # a deleted key's lookup is empty, still scan-pruned
    assert mor_read(spark, path, ["k"]).filter(F.col("k") == 7).count() == 0


def test_mor_changelog_bucketed_parity_and_zero_exchange(spark, tmp_path):
    """The bucketed changelog must (a) emit exactly the path-based
    changelog's rows for the same batches, and (b) plan with ZERO
    shuffle exchanges — two bucket-clustered folds and a co-located
    full-outer key join."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_apply_changes_bucketed,
        mor_changelog,
        mor_changelog_bucketed,
        mor_create_bucketed,
        mor_write_base,
    )

    base = spark.createDataFrame([(i, f"v{i}") for i in range(30)], ["k", "val"])
    ups = base.filter(F.col("k") % 3 == 0).select(
        "k", F.concat(F.lit("u"), F.col("k")).alias("val")
    )
    dels = spark.createDataFrame([(2,), (4,)], ["k"])

    path = str(tmp_path / "m")
    mor_write_base(base, path)
    mor_apply_changes(spark, path, ["k"], upserts=ups, delete_keys=dels)

    tbl = "t_mor_cdc_bucketed"
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in (tbl, f"{tbl}__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a stale managed-table dir from a previous session (in-memory
        # catalog forgets tables; the warehouse dir does not) blocks
        # saveAsTable with LOCATION_ALREADY_EXISTS — clear it
        from shared_etl_pipelines_spark.engine import hadoop_fs

        fs, jp = hadoop_fs(spark, os.path.join(wh, t))
        if fs.exists(jp):
            fs.delete(jp, True)
    mor_create_bucketed(base, tbl, ["k"], n_buckets=4)
    mor_apply_changes_bucketed(
        spark, tbl, ["k"], upserts=ups, delete_keys=dels, n_buckets=4
    )

    want = {
        r["k"]: (r["_op"], r["val"])
        for r in mor_changelog(spark, path, ["k"], 0, 1).collect()
    }
    bucketed = mor_changelog_bucketed(spark, tbl, ["k"], 0, 1)
    got = {r["k"]: (r["_op"], r["val"]) for r in bucketed.collect()}
    assert got == want and want  # layout never changes CDC semantics

    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    # zero SHUFFLE exchanges: the folds and the full-outer key join all
    # consume the bucket clustering; the only exchanges are broadcasts
    # of the change-batch-sized tombstone aggregates
    assert "Exchange hashpartitioning" not in plan, plan
    for t in (tbl, f"{tbl}__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_mor_compact_lock_is_swap_surviving_sibling(spark, tmp_path):
    """ADVICE r7 #1: the maintenance lock must live OUTSIDE the table
    directory. A lock inside it is renamed away with the old base
    mid-swap, so a concurrent writer could re-create the live path and
    strand the compacted base at .old. Here: compaction and
    apply_changes share the sibling lock (mutual exclusion both ways),
    and a successful compact leaves no lock, no .old, no .compacting."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import acquire_fs_lock, release_fs_lock
    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_compact,
        mor_read,
        mor_write_base,
    )

    path = str(tmp_path / "mor_sibling")
    base = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("val"))
    mor_write_base(base, path)
    up = spark.createDataFrame([(1, "y")], ["k", "val"])
    mor_apply_changes(spark, path, ["k"], upserts=up)

    lock = path.rstrip("/") + ".mor.lock"
    acquire_fs_lock(spark, lock, owner="test-other-writer")
    with _pytest.raises(RuntimeError, match="single-writer lock"):
        mor_compact(spark, path, ["k"])
    release_fs_lock(spark, lock)

    s = mor_compact(spark, path, ["k"])
    assert s["live_rows"] == 10
    assert not os.path.exists(lock)
    assert not os.path.exists(path.rstrip("/") + ".old")
    assert not os.path.exists(path.rstrip("/") + ".compacting")
    # post-compact the table is live at its original path and writable
    assert mor_read(spark, path, ["k"]).count() == 10
    s2 = mor_apply_changes(spark, path, ["k"], upserts=up)
    assert s2["seq"] == 1
