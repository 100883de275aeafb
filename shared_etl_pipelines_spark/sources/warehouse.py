"""Warehouse layout: partitioned datasets and bucketed tables.

The reference's lake is directory-partitioned by year/day with
recompute-derived semantics (`overwrite: true` on stage layers, P3) and
skip-if-exists on raw layers (P1) — SURVEY.md §4. The Spark-native
equivalents:

- write_partitioned + dynamic partition overwrite: re-running one year
  replaces exactly that year's partition, never the whole dataset (the
  per-year `foreach` recompute of prism-mi-corn-ppt-county.yml:83).
- partition pruning: filters on partition columns prune directories at
  planning time (verified in tests via PartitionFilters in the scan).
- write_bucketed: pre-shuffled, co-located layout for the joins that
  repeat every day (cells⋈weights, facts⋈dims on the same key). Two
  tables bucketed on the join key by the same bucket count join with NO
  exchange on either side — at 100 TB that removes the dominant shuffle
  from every daily run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned parquet write; with ``dynamic`` only the partitions
    present in ``df`` are replaced (P3 recompute-derived semantics)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_partition(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_bytes)`` files.

    Streaming sinks and per-day foreach recomputes accumulate many small
    files; at scale the resulting scan is dominated by open/footer costs
    and task-scheduling overhead, not bytes. Compaction is a single
    coalesce-rewrite: no shuffle (coalesce narrows), write to a temp dir,
    then atomically swap directories — a failed compaction leaves the
    original intact (the same write-to-temp discipline as the catalog
    upsert O5). Returns {files_before, files_after, bytes}.
    """
    import math
    import os
    import shutil

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_out >= len(files):
        return {"files_before": len(files), "files_after": len(files), "bytes": total}

    tmp = path.rstrip("/") + "._compact_tmp"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return {"files_before": len(files), "files_after": n_after, "bytes": total}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write (saveAsTable — bucket metadata lives in the
    session catalog). Join two tables bucketed on the same key and count
    and Catalyst plans a shuffle-free sort-merge join."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


# ---------------------------------------------------------------------------
# Merge-on-read change application — the Iceberg/Delta deletion-vector
# pattern on plain parquet, complementing the copy-on-write keyed MERGE
# (sources/catalog.py catalog_json_upsert, O5): small change batches
# must not rewrite 100 TB partitions, so upserts APPEND versioned rows
# and deletes APPEND key tombstones; the reader folds both with one
# keyed shuffle, and compaction bounds the read debt.
# ---------------------------------------------------------------------------
def _mor_deletes_path(path: str) -> str:
    import os

    # underscore prefix: invisible to the main parquet listing
    return os.path.join(path, "_deletes")


def mor_write_base(df: DataFrame, path: str) -> None:
    """Write the base snapshot of a merge-on-read table (version 0)."""
    from pyspark.sql import functions as F

    df.withColumn("_seq", F.lit(0).cast("long")).write.mode("overwrite").parquet(path)


def mor_apply_changes(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    upserts: DataFrame | None = None,
    delete_keys: DataFrame | None = None,
) -> dict:
    """Apply one change batch without touching existing files: upsert
    rows append with the next ``_seq``; deleted keys (plus the keys of
    upserted rows — their old versions die) append ``(keys, _seq)``
    under ``_deletes/``. Within a batch an upsert of a deleted key wins
    (its row carries the batch's own seq; tombstones only kill strictly
    older versions). Work is O(|batch|), never O(table).

    SINGLE-WRITER, enforced: seq is read-then-append, so concurrent
    batches would mint the same seq and mask each other's rows — a
    fail-loud lock file (``<table>.mor.lock``, a sibling of the table
    directory so it survives ``mor_compact``'s swap — ADVICE r7 #1 —
    atomic createNewFile) turns
    that race into an error instead (engine.acquire_fs_lock; ADVICE r5
    multi-writer story). Crash safety: data rows append BEFORE
    tombstones (ADVICE r5 #2) — a crash between the writes leaves
    recoverable duplicates that ``mor_read``'s latest-per-key window
    already resolves, never vanished keys. A crashed writer leaves the
    lock held; clear with ``engine.release_fs_lock`` once confirmed
    dead."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import (
        acquire_fs_lock,
        fs_exists,
        release_fs_lock,
    )

    dead = None
    if upserts is not None:
        dead = upserts.select(*key_cols)
    if delete_keys is not None:
        d = delete_keys.select(*key_cols)
        dead = d if dead is None else dead.unionByName(d)
    if dead is None:
        return {"seq": 0, "rows_appended": 0, "keys_tombstoned": 0}
    lock = path.rstrip("/") + ".mor.lock"
    acquire_fs_lock(spark, lock, owner="mor_apply_changes")
    try:
        dpath = _mor_deletes_path(path)
        seq = 1
        if fs_exists(spark, dpath):
            prev = spark.read.parquet(dpath).agg(F.max("_seq")).collect()[0][0]
            seq = int(prev or 0) + 1
        n_new = 0
        if upserts is not None:
            rows = upserts.withColumn("_seq", F.lit(seq).cast("long")).persist()
            n_new = rows.count()  # persisted: write reuses, not recomputes
            rows.write.mode("append").parquet(path)
            rows.unpersist()
        tomb = dead.distinct().withColumn("_seq", F.lit(seq).cast("long")).persist()
        n_dead = tomb.count()  # persisted: was double-computed (VERDICT r5 #3)
        tomb.coalesce(1).write.mode("append").parquet(dpath)
        tomb.unpersist()
    finally:
        release_fs_lock(spark, lock)
    return {"seq": seq, "rows_appended": int(n_new), "keys_tombstoned": int(n_dead)}


def _mor_state(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    as_of_seq: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Latest surviving row per key (``_seq`` column retained), as of
    ``as_of_seq`` (None = newest). The shared fold behind ``mor_read``
    and ``mor_changelog``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import fs_exists

    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    rows = reader.parquet(path)
    if as_of_seq is not None:
        rows = rows.filter(F.col("_seq") <= int(as_of_seq))
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    latest = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    dpath = _mor_deletes_path(path)
    if fs_exists(spark, dpath):
        tomb = spark.read.parquet(dpath)
        if as_of_seq is not None:
            tomb = tomb.filter(F.col("_seq") <= int(as_of_seq))
        tomb = tomb.groupBy(*key_cols).agg(F.max("_seq").alias("_dead_seq"))
        latest = (
            latest.join(F.broadcast(tomb), key_cols, "left")
            .filter(F.col("_dead_seq").isNull() | (F.col("_seq") >= F.col("_dead_seq")))
            .drop("_dead_seq")
        )
    return latest


def mor_read(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    as_of_seq: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Current state of a merge-on-read table: latest version per key
    (row_number over ``_seq`` desc — ONE keyed shuffle, the read-side
    price merge-on-read trades for O(|batch|) writes), minus keys whose
    newest tombstone outranks the row. Tombstone side is change-batch
    sized — broadcast. ``mor_compact`` folds the debt back to a plain
    scan when it grows. Tombstone existence goes through the Hadoop
    FileSystem API so hdfs:// and s3a:// tables resolve their deletes
    exactly like local ones (ADVICE r5 #1).

    ``as_of_seq`` time-travels: the fold sees only versions and
    tombstones with ``_seq <= as_of_seq`` (0 = the base snapshot),
    pruned at the scan before any shuffle — the Iceberg/Delta
    snapshot-read pattern on plain parquet. History is bounded by the
    last ``mor_compact``, which folds every version into a new seq-0
    base (the snapshot-expiry analog: compaction trades time-travel
    depth for read speed). ``merge_schema`` unions parquet footers so a
    table whose later batches added columns reads as the evolved
    schema, pre-evolution rows NULL in the new columns."""
    return _mor_state(spark, path, key_cols, as_of_seq, merge_schema).drop("_seq")


def mor_changelog(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    from_seq: int,
    to_seq: int,
) -> DataFrame:
    """CDC read: the row-level changes that turn snapshot ``from_seq``
    into snapshot ``to_seq``, as (key cols, value cols, ``_op``) with
    ``_op`` in {'insert','update','delete'} — the Delta CDF / Iceberg
    changelog-scan shape. Updates and inserts carry the postimage,
    deletes the preimage. A key whose row version is unchanged between
    the snapshots emits nothing; a delete-then-reinsert between the
    endpoints collapses to one 'update' (endpoint semantics, exactly
    like Delta CDF over a version range). Change detection is by row
    version (``_seq``), not value equality, so an upsert that rewrote
    identical values still emits 'update' — the standard CDC contract.

    Plan shape: two as-of folds (each one keyed window over a
    seq-pruned scan) + one full-outer join on the key — no value-column
    comparison, no driver traffic; at 100 TB both sides prune to
    ``_seq <= endpoint`` before shuffling."""
    from pyspark.sql import functions as F

    old = _mor_state(spark, path, key_cols, from_seq, merge_schema=True)
    new = _mor_state(spark, path, key_cols, to_seq, merge_schema=True)
    val_cols = [c for c in new.columns if c not in key_cols and c != "_seq"]
    old_vals = {c for c in old.columns if c not in key_cols and c != "_seq"}
    o = old.select(
        *key_cols,
        F.col("_seq").alias("_from_seq"),
        *[F.col(c).alias(f"_from_{c}") for c in val_cols if c in old_vals],
    )
    n = new.select(*key_cols, F.col("_seq").alias("_to_seq"), *val_cols)
    j = o.join(n, key_cols, "full_outer")
    op = (
        F.when(F.col("_to_seq").isNull(), F.lit("delete"))
        .when(F.col("_from_seq").isNull(), F.lit("insert"))
        .when(F.col("_to_seq") != F.col("_from_seq"), F.lit("update"))
    )
    picked = [
        (
            F.when(
                F.col("_to_seq").isNull(), F.col(f"_from_{c}")
            ).otherwise(F.col(c))
            if c in old_vals
            else F.col(c)
        ).alias(c)
        for c in val_cols
    ]
    return (
        j.withColumn("_op", op)
        .filter(F.col("_op").isNotNull())
        .select(*key_cols, *picked, "_op")
    )


def mor_history(spark: SparkSession, path: str) -> DataFrame:
    """Audit log of a merge-on-read table: one row per change batch —
    (``_seq``, ``rows_appended``, ``keys_tombstoned``). Seq 0 is the
    base snapshot (or the last compaction). Two grouped counts over the
    data and tombstone directories; O(versions) output."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import fs_exists

    appended = (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .groupBy("_seq")
        .agg(F.count(F.lit(1)).alias("rows_appended"))
    )
    dpath = _mor_deletes_path(path)
    if fs_exists(spark, dpath):
        tombs = (
            spark.read.parquet(dpath)
            .groupBy("_seq")
            .agg(F.count(F.lit(1)).alias("keys_tombstoned"))
        )
    else:
        tombs = appended.select(
            "_seq", F.lit(0).cast("long").alias("keys_tombstoned")
        ).limit(0)
    return (
        appended.join(tombs, "_seq", "full_outer")
        .select(
            F.col("_seq").cast("long").alias("_seq"),
            F.coalesce(F.col("rows_appended"), F.lit(0)).cast("long").alias(
                "rows_appended"
            ),
            F.coalesce(F.col("keys_tombstoned"), F.lit(0)).cast("long").alias(
                "keys_tombstoned"
            ),
        )
        .orderBy("_seq")
    )


def mor_compact(spark: SparkSession, path: str, key_cols: list[str]) -> dict:
    """Fold change debt to zero: materialize the current state as a new
    version-0 base, atomically swap, drop tombstones (the local-fs
    analog of a catalog pointer swap).

    Compaction is a WRITER: it folds appended versions + tombstones and
    replaces the base, so it takes the same fail-loud
    ``<table>.mor.lock`` as ``mor_apply_changes`` (ADVICE r6 #3 — a
    compaction racing a change batch would otherwise fold state while
    the batch appends and silently lose it). The lock is a SIBLING of
    the table directory (ADVICE r7 #1): a lock inside it would be
    renamed away with the old base, letting a concurrent writer
    re-create the live path mid-swap (ENOTEMPTY on the final rename,
    base stranded at .old). The sibling survives the swap and is
    released only after the old directory is removed."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import acquire_fs_lock, release_fs_lock

    lock = path.rstrip("/") + ".mor.lock"
    acquire_fs_lock(spark, lock, owner="mor_compact")
    try:
        live = mor_read(spark, path, key_cols).withColumn(
            "_seq", F.lit(0).cast("long")
        )
        tmp = path.rstrip("/") + ".compacting"
        live.write.mode("overwrite").parquet(tmp)
        n = spark.read.parquet(tmp).count()
        old = path.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        # sibling lock survives both renames; released only here, after
        # the old directory is removed (or on pre-swap failure).
        release_fs_lock(spark, lock)
    return {"live_rows": int(n)}


# ---------------------------------------------------------------------------
# Bucketed merge-on-read — the 100 TB read path (VERDICT r5 #5).
#
# The path-based mor_read above pays one full keyed shuffle per read
# (row_number over an unpartitioned base): the standard MoR read debt.
# Storing the base AND every appended change batch in one bucketed
# TABLE (same bucketBy(key) spec — appends land in per-bucket files)
# makes the scan itself hash-clustered on the key, so the latest-
# version window needs NO exchange (plan: Bucketed: true + Sort +
# WindowGroupLimit, zero Exchange — gated in tests/test_warehouse.py),
# and the tombstone twin table, bucketed identically, merges with a
# zero-exchange sort-merge join. Read cost at 100 TB collapses from
# "shuffle the table" to "sort each bucket file-group".
# ---------------------------------------------------------------------------
def _mor_tombstone_table(table: str) -> str:
    return f"{table}__tombstones"


def _table_location(spark: SparkSession, table: str) -> str:
    row = [
        r
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r[0].strip() == "Location"
    ]
    return row[0][1].strip()


def mor_create_bucketed(
    df: DataFrame,
    table: str,
    key_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Base snapshot (version 0) of a bucketed merge-on-read table."""
    from pyspark.sql import functions as F

    (
        df.withColumn("_seq", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .bucketBy(n_buckets, *key_cols)
        .sortBy(*key_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def mor_apply_changes_bucketed(
    spark: SparkSession,
    table: str,
    key_cols: list[str],
    upserts: DataFrame | None = None,
    delete_keys: DataFrame | None = None,
    n_buckets: int = 32,
) -> dict:
    """Bucketed twin of ``mor_apply_changes``: same seq/tombstone
    semantics and the same single-writer lock + data-before-tombstone
    crash ordering, but appends preserve the bucket layout (Spark
    rejects a mismatched spec — layout drift fails loud) so reads stay
    exchange-free. Work per batch is O(|batch|): an append writes only
    the batch's own per-bucket files, never touching existing ones."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import acquire_fs_lock, release_fs_lock

    dead = None
    if upserts is not None:
        dead = upserts.select(*key_cols)
    if delete_keys is not None:
        d = delete_keys.select(*key_cols)
        dead = d if dead is None else dead.unionByName(d)
    if dead is None:
        return {"seq": 0, "rows_appended": 0, "keys_tombstoned": 0}
    ttable = _mor_tombstone_table(table)
    lock = _table_location(spark, table).rstrip("/") + ".mor.lock"
    acquire_fs_lock(spark, lock, owner="mor_apply_changes_bucketed")
    try:
        seq = 1
        if spark.catalog.tableExists(ttable):
            prev = spark.table(ttable).agg(F.max("_seq")).collect()[0][0]
            seq = int(prev or 0) + 1
        n_new = 0
        if upserts is not None:
            rows = upserts.withColumn("_seq", F.lit(seq).cast("long")).persist()
            n_new = rows.count()
            (
                rows.write.mode("append")
                .bucketBy(n_buckets, *key_cols)
                .sortBy(*key_cols)
                .format("parquet")
                .saveAsTable(table)
            )
            rows.unpersist()
        tomb = dead.distinct().withColumn("_seq", F.lit(seq).cast("long")).persist()
        n_dead = tomb.count()
        (
            tomb.write.mode("append")
            .bucketBy(n_buckets, *key_cols)
            .sortBy(*key_cols)
            .format("parquet")
            .saveAsTable(ttable)
        )
        tomb.unpersist()
    finally:
        release_fs_lock(spark, lock)
    return {"seq": seq, "rows_appended": int(n_new), "keys_tombstoned": int(n_dead)}


def _mor_state_bucketed(
    spark: SparkSession,
    table: str,
    key_cols: list[str],
    as_of_seq: int | None = None,
) -> DataFrame:
    """Latest surviving row per key of a bucketed MoR table (``_seq``
    retained), as of ``as_of_seq`` — the zero-exchange fold behind
    ``mor_read_bucketed`` and ``mor_changelog_bucketed``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = spark.table(table)
    if as_of_seq is not None:
        rows = rows.filter(F.col("_seq") <= int(as_of_seq))
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    latest = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    ttable = _mor_tombstone_table(table)
    if spark.catalog.tableExists(ttable):
        tomb = spark.table(ttable)
        if as_of_seq is not None:
            tomb = tomb.filter(F.col("_seq") <= int(as_of_seq))
        tomb = tomb.groupBy(*key_cols).agg(F.max("_seq").alias("_dead_seq"))
        latest = (
            latest.join(tomb, key_cols, "left")
            .filter(F.col("_dead_seq").isNull() | (F.col("_seq") >= F.col("_dead_seq")))
            .drop("_dead_seq")
        )
    return latest


def mor_read_bucketed(
    spark: SparkSession,
    table: str,
    key_cols: list[str],
    as_of_seq: int | None = None,
) -> DataFrame:
    """Current state of a bucketed merge-on-read table with ZERO
    exchanges: the latest-version window and the tombstone merge both
    consume the bucket layout directly. Semantics identical to
    ``mor_read`` (latest row per key unless a newer tombstone kills
    it), including ``as_of_seq`` time travel — the seq filter prunes
    before the (exchange-free) window, so a snapshot read costs the
    same as a current read."""
    return _mor_state_bucketed(spark, table, key_cols, as_of_seq).drop("_seq")


def mor_changelog_bucketed(
    spark: SparkSession,
    table: str,
    key_cols: list[str],
    from_seq: int,
    to_seq: int,
) -> DataFrame:
    """CDC read of a bucketed MoR table — ``mor_changelog`` semantics
    (insert/update/delete by row version, postimage on upsert, preimage
    on delete, endpoint collapsing) with the bucketed layout's cost
    profile: both as-of folds AND the full-outer key join consume the
    bucket clustering, so the whole changelog plans with ZERO shuffle
    exchanges (gated in tests) — at 100 TB a CDC read costs two sorted
    bucket scans, never a shuffle of the table."""
    from pyspark.sql import functions as F

    old = _mor_state_bucketed(spark, table, key_cols, from_seq)
    new = _mor_state_bucketed(spark, table, key_cols, to_seq)
    val_cols = [c for c in new.columns if c not in key_cols and c != "_seq"]
    o = old.select(
        *key_cols,
        F.col("_seq").alias("_from_seq"),
        *[F.col(c).alias(f"_from_{c}") for c in val_cols],
    )
    n = new.select(*key_cols, F.col("_seq").alias("_to_seq"), *val_cols)
    j = o.join(n, key_cols, "full_outer")
    op = (
        F.when(F.col("_to_seq").isNull(), F.lit("delete"))
        .when(F.col("_from_seq").isNull(), F.lit("insert"))
        .when(F.col("_to_seq") != F.col("_from_seq"), F.lit("update"))
    )
    picked = [
        F.when(F.col("_to_seq").isNull(), F.col(f"_from_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in val_cols
    ]
    return (
        j.withColumn("_op", op)
        .filter(F.col("_op").isNotNull())
        .select(*key_cols, *picked, "_op")
    )


def mor_compact_bucketed(
    spark: SparkSession, table: str, key_cols: list[str], n_buckets: int = 32
) -> dict:
    """Fold change debt to zero: rewrite the current state as a fresh
    version-0 bucketed base and drop the tombstone table. The rewrite
    goes through a staging table then replaces the target — on a
    catalog with atomic RENAME this is the pointer swap; here it is
    overwrite-in-place after materializing the state (staging keeps a
    failed read from half-applying).

    Compaction is a WRITER: it takes the same fail-loud ``_mor.lock``
    as ``mor_apply_changes_bucketed`` (ADVICE r6 #3) so it can never
    fold state while a change batch appends. The lock lives at the
    pre-compaction table location; the staging-table RENAME is the
    commit point."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.engine import acquire_fs_lock, release_fs_lock

    lock = _table_location(spark, table).rstrip("/") + ".mor.lock"
    acquire_fs_lock(spark, lock, owner="mor_compact_bucketed")
    try:
        state = mor_read_bucketed(spark, table, key_cols).persist()
        n = state.count()
        (
            state.withColumn("_seq", F.lit(0).cast("long"))
            .write.mode("overwrite")
            .bucketBy(n_buckets, *key_cols)
            .sortBy(*key_cols)
            .format("parquet")
            .saveAsTable(f"{table}__compacting")
        )
        state.unpersist()
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"ALTER TABLE {table}__compacting RENAME TO {table}")
        spark.sql(f"DROP TABLE IF EXISTS {_mor_tombstone_table(table)}")
    finally:
        # the DROP TABLE removed the locked location on success; on a
        # pre-commit failure this releases the lock (nothing half-applied
        # — the staging table is the only thing written before the swap).
        release_fs_lock(spark, lock)
    return {"live_rows": int(n)}


# ---------------------------------------------------------------------------
# Partition-spec evolution — the Iceberg rule (spec changes apply to NEW
# data only; old files keep their old layout and are pruned by their own
# spec) on plain parquet directories. Each spec change starts a new ERA
# subdirectory with its own partitionBy layout, recorded in a JSON
# manifest; the reader unions the eras by name, so a predicate on a
# column that is a partition key in era N and a data column in era M
# prunes directories in the first and pushes into the parquet scan in
# the second — never a rewrite of historical data.
# ---------------------------------------------------------------------------
def _evolution_manifest(path: str) -> str:
    import os

    return os.path.join(path, "_partition_specs.json")


def write_partition_era(df: DataFrame, path: str, spec: list[str]) -> int:
    """Write ``df`` as the next era of an evolved table under its own
    ``partitionBy(spec)`` layout and append the spec to the manifest.
    Returns the era number. The manifest write is atomic (tmp+replace);
    a crash before it leaves an unreferenced era directory the reader
    never sees — the Iceberg invisible-until-committed rule."""
    import json
    import os

    eras = []
    mf = _evolution_manifest(path)
    if os.path.exists(mf):
        with open(mf) as fh:
            eras = json.load(fh)
    era = len(eras)
    era_dir = os.path.join(path, f"era={era}")
    w = df.write.mode("overwrite")
    if spec:
        w = w.partitionBy(*spec)
    w.parquet(era_dir)
    eras.append({"era": era, "dir": f"era={era}", "spec": list(spec)})
    os.makedirs(path, exist_ok=True)
    tmp = mf + f".{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        json.dump(eras, fh)
    os.replace(tmp, mf)
    return era


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Union every committed era by name. Partition columns of each era
    surface from its own directory layout, so Catalyst prunes each
    era's scan under ITS spec: a filter on a new partition key prunes
    directories in new eras and pushes down as a row filter in old
    ones (gated in tests/test_warehouse.py)."""
    import json
    import os

    with open(_evolution_manifest(path)) as fh:
        eras = json.load(fh)
    if not eras:
        raise ValueError(f"no committed eras under {path}")
    out = None
    types: dict[str, str] = {}
    for e in eras:
        df = spark.read.parquet(os.path.join(path, e["dir"]))
        # Fail loud on type drift: a column that is data in one era and
        # a partition key in another must round-trip to the SAME type
        # (directory values are type-inferred — '1-URGENT' stays string,
        # bare '1' would become int and silently cast the whole union,
        # defeating both pushdown and pruning). Write such keys
        # unambiguously or pre-cast before the era write.
        for f_ in df.schema.fields:
            seen = types.setdefault(f_.name, f_.dataType.simpleString())
            if seen != f_.dataType.simpleString():
                raise TypeError(
                    f"partition-evolution type drift on {f_.name!r}: "
                    f"{seen} in an earlier era vs "
                    f"{f_.dataType.simpleString()} in {e['dir']}"
                )
        out = df if out is None else out.unionByName(df)
    return out
