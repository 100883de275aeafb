"""Set operations / file combination.

Reference: combine_files.py — concatenate many same-schema CSVs into one
(pipelines/prism/county_daily_aggregate.yml:38-44): the reference's
UNION ALL. Natively a glob read IS the union; for heterogenous frames we
use unionByName with missing-column fill.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def combine_files(
    spark: SparkSession,
    paths_or_glob: str | list[str],
    fmt: str = "csv",
    **options,
) -> DataFrame:
    """Read many same-schema files as one DataFrame (S6). A glob read is a
    single distributed scan — no driver-side concatenation."""
    reader = spark.read.options(**options)
    if fmt == "csv":
        return reader.csv(paths_or_glob, header=options.get("header", True))
    if fmt == "parquet":
        return reader.parquet(
            *(paths_or_glob if isinstance(paths_or_glob, list) else [paths_or_glob])
        )
    if fmt == "json":
        return reader.json(paths_or_glob)
    raise ValueError(f"unsupported format: {fmt}")


def union_all(frames: list[DataFrame], by_name: bool = True) -> DataFrame:
    """UNION ALL of N frames; by_name tolerates column-order differences
    and fills missing columns with NULL."""
    if not frames:
        raise ValueError("union_all of zero frames")
    if by_name:
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
        )
    return reduce(DataFrame.union, frames)
