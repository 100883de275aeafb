"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over shared_etl_pipelines_spark.queries.REGISTRY — the
engine's named-query registry where every implemented operator from
SURVEY.md §2 lives alongside its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shared_etl_pipelines_spark import queries as Q  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (G4 zonal statistics) on sf0.001; driver checks rows>0."""
    return Q.REGISTRY["zonal_stats"].fn(spark, SMOKE_DIR)


def _fresh(fn: Callable[[SparkSession, str], DataFrame]):
    """Unpersist leftover RDD-level storage before building each query.

    Iterative operators cut lineage with localCheckpoint, which persists
    RDD storage that spark.catalog.clearCache() does not reach; a gate
    session running a few hundred queries otherwise accumulates dead
    checkpoint partitions in the unified memory pool and late queries
    pay storage-eviction churn (measured: embedding_dbscan ~3.5s fresh
    vs 11-23s late-in-session). Safe here: nothing from a PREVIOUS
    query is ever a live dependency of the next one.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist()
        except Exception:
            pass  # cleanup must never fail a query (e.g. exotic masters)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _fresh(qd.fn) for name, qd in Q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return {name: qd.sql for name, qd in Q.REGISTRY.items() if qd.sql is not None}
