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
