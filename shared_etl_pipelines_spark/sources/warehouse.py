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
