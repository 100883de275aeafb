"""SparkSession factory.

One place to encode the scale-aware defaults:

- AQE on (runtime re-plan: shuffle-partition coalescing, skew-join splitting)
  so plans built for local[32] survive a 1000-executor cluster unchanged.
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  are reproducible across clusters.
- Arrow enabled for every Python<->JVM crossing (pandas UDFs, toPandas).
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant as long as it is
  not too small, so we default to max(cores, 32).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_APP = "shared_etl_pipelines_spark"


def get_spark(
    app_name: str = _DEF_APP,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster, ``master`` comes from spark-submit and is left unset here.
    Locally we default to ``local[$SPARK_GRAFT_CPUS or *]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(n, 16)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Only pin a master when not running under a cluster manager.
    if not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def sweep_persistent_rdds(spark: SparkSession) -> None:
    """Unpersist every RDD-level storage registration in the session.

    Iterative operators cut lineage with localCheckpoint, whose storage
    ``spark.catalog.clearCache()`` does not reach; a session running
    hundreds of queries otherwise accumulates dead checkpoint partitions
    and late iterative queries pay storage-eviction churn. Call BETWEEN
    independent queries only: unpersisting a localCheckpoint that a
    still-unevaluated DataFrame depends on is unrecoverable (truncated
    lineage cannot recompute). As a guard against exactly that misuse,
    this function refuses to sweep while any job or streaming query is
    active in the session.
    """
    sc = spark.sparkContext
    if spark.streams.active:
        raise RuntimeError(
            "sweep_persistent_rdds called with active streaming queries; "
            "stop them first — sweeping would truncate live state lineage"
        )
    try:
        from py4j.protocol import Py4JError

        tracker = sc.statusTracker()
        if tracker.getActiveJobsIds():
            raise RuntimeError(
                "sweep_persistent_rdds called while Spark jobs are active; "
                "call it only between independent queries"
            )
        for jrdd in sc._jsc.getPersistentRDDs().values():
            jrdd.unpersist()
    except Py4JError as e:  # exotic masters without the JVM surface
        import logging

        logging.getLogger(__name__).debug("persistent-RDD sweep skipped: %s", e)
