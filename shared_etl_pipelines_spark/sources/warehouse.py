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
    older versions). Work is O(|batch|), never O(table). SINGLE-WRITER:
    seq is read-then-append, serialize change batches."""
    import os

    from pyspark.sql import functions as F

    dpath = _mor_deletes_path(path)
    seq = 1
    if os.path.exists(dpath):
        prev = spark.read.parquet(dpath).agg(F.max("_seq")).collect()[0][0]
        seq = int(prev or 0) + 1
    dead = None
    if upserts is not None:
        dead = upserts.select(*key_cols)
    if delete_keys is not None:
        d = delete_keys.select(*key_cols)
        dead = d if dead is None else dead.unionByName(d)
    if dead is None:
        return {"seq": 0, "rows_appended": 0, "keys_tombstoned": 0}
    tomb = dead.distinct().withColumn("_seq", F.lit(seq).cast("long"))
    n_dead = tomb.count()
    tomb.coalesce(1).write.mode("append").parquet(dpath)
    n_new = 0
    if upserts is not None:
        rows = upserts.withColumn("_seq", F.lit(seq).cast("long"))
        n_new = rows.count()
        rows.write.mode("append").parquet(path)
    return {"seq": seq, "rows_appended": int(n_new), "keys_tombstoned": int(n_dead)}


def mor_read(spark: SparkSession, path: str, key_cols: list[str]) -> DataFrame:
    """Current state of a merge-on-read table: latest version per key
    (row_number over ``_seq`` desc — ONE keyed shuffle, the read-side
    price merge-on-read trades for O(|batch|) writes), minus keys whose
    newest tombstone outranks the row. Tombstone side is change-batch
    sized — broadcast. ``mor_compact`` folds the debt back to a plain
    scan when it grows."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = spark.read.parquet(path)
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    latest = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    dpath = _mor_deletes_path(path)
    if os.path.exists(dpath):
        tomb = (
            spark.read.parquet(dpath)
            .groupBy(*key_cols)
            .agg(F.max("_seq").alias("_dead_seq"))
        )
        latest = (
            latest.join(F.broadcast(tomb), key_cols, "left")
            .filter(F.col("_dead_seq").isNull() | (F.col("_seq") >= F.col("_dead_seq")))
            .drop("_dead_seq")
        )
    return latest.drop("_seq")


def mor_compact(spark: SparkSession, path: str, key_cols: list[str]) -> dict:
    """Fold change debt to zero: materialize the current state as a new
    version-0 base, atomically swap, drop tombstones (the local-fs
    analog of a catalog pointer swap)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    live = mor_read(spark, path, key_cols).withColumn("_seq", F.lit(0).cast("long"))
    tmp = path.rstrip("/") + ".compacting"
    live.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {"live_rows": int(n)}
