"""Streaming-mode registry queries (rows-only correctness contract).

These run real Structured Streaming jobs (availableNow trigger, memory
sink) over the sf_dir events table treated as a drop-directory file
source — the reference's incremental daily cadence (SURVEY.md §7.6).
They are registered WITHOUT oracle SQL: watermark-driven emission is not
ANSI-SQL-expressible, so the driver applies its rows-only check; batch
equivalence is separately asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from shared_etl_pipelines_spark.queries import defquery
from shared_etl_pipelines_spark.streaming import running_totals, tumbling_agg


def _events_stream(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, "events.parquet")
    # same nanos-timestamp and canonical-UTC handling as
    # sources.tables.load_table: read the nanos column as long, rebuild
    # microsecond timestamps, and pin the session zone so event-time
    # windows are stable whatever zone the caller session started in
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(path).schema
    # the file source wants a directory: stream the sf_dir filtered down
    # to the events file
    df = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    elif ts_type == "timestamp_ntz":
        # parquet timestamp[us] no-tz reads as TIMESTAMP_NTZ; watermarks require
        # TimestampType — lossless cast with the session zone pinned UTC above
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _run(df: DataFrame, mode: str) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


@defquery(
    "stream_tumbling_daily",
    None,  # watermark emission semantics are not ANSI-SQL-expressible
    doc="streaming tumbling 1-day window counts/sums per event_type",
    tags=("streaming", "window"),
)
def q_stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = tumbling_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "1 day",
        ["event_type"],
        {"n": "count(1)", "total": "sum(value)"},
    )
    return _run(agg, "append")


@defquery(
    "stream_running_totals",
    None,  # custom stateful operator (applyInPandasWithState)
    doc="streaming per-user cumulative totals via applyInPandasWithState",
    tags=("streaming", "stateful"),
)
def q_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(running_totals(_events_stream(spark, sf_dir)), "update")


@defquery(
    "stream_sliding_3d",
    None,  # watermark emission semantics are not ANSI-SQL-expressible
    doc="streaming sliding 3-day/1-day window — G2's trailing rolling sum",
    tags=("streaming", "window", "G2"),
)
def q_stream_sliding_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.streaming import sliding_agg

    agg = sliding_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "3 days",
        "1 day",
        ["event_type"],
        {"n": "count(1)", "total": "sum(value)"},
    )
    return _run(agg, "append")


@defquery(
    "stream_session_windows",
    None,  # session_window merge semantics are stateful/streaming-only
    doc="streaming session windows (30 min gap) per user",
    tags=("streaming", "session"),
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.streaming import session_agg

    agg = session_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "30 minutes",
        ["user_id"],
        {"n_events": "count(1)", "total_value": "sum(value)"},
    )
    return _run(agg, "append")


@defquery(
    "stream_dedup_hashes",
    None,  # watermark-bounded dedup state is streaming-only semantics
    doc="streaming exact dedup: first arrival per content hash, state "
    "expired by watermark (dropDuplicatesWithinWatermark)",
    tags=("streaming", "dedup"),
)
def q_stream_dedup_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.streaming import dedup_stream

    deduped = dedup_stream(
        _events_stream(spark, sf_dir),
        ["user_id", "event_type", "value"],
        ts_col="ts",
        delay="2 days",
    )
    kept = _run(deduped, "append")
    # project the deterministic part: the distinct content-hash set (which
    # row of a duplicate group arrives first varies with task order)
    return kept.select("content_hash").distinct()


@defquery(
    "stream_static_enrichment",
    None,  # watermark emission semantics are not ANSI-SQL-expressible
    doc="stream-static join: streaming events enriched against the static "
    "customer dimension (broadcast per micro-batch), then tumbling daily "
    "counts per market segment",
    tags=("streaming", "join", "enrichment"),
)
def q_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static equi-join: the canonical streaming enrichment shape.

    The static side is a batch DataFrame re-resolved every micro-batch
    (picks up dimension updates between batches); Spark plans it as a
    broadcast against each micro-batch, so no streaming state is kept for
    the join itself — only the downstream windowed aggregate holds state.
    """
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.tables import load_table
    from shared_etl_pipelines_spark.streaming import tumbling_agg

    ev = _events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(dim), "user_id", "left").withColumn(
        "segment", F.coalesce("c_mktsegment", F.lit("<unknown>"))
    )
    agg = tumbling_agg(
        enriched,
        "ts",
        "1 day",
        ["segment"],
        {"n": "count(1)", "total": "sum(value)"},
    )
    return _run(agg, "append")


@defquery(
    "stream_interval_join",
    None,  # watermark-bounded stream-stream join state is streaming-only
    doc="stream-stream interval join: clicks -> purchases by the same user "
    "within 1 hour (both sides watermarked; state evicted by time range)",
    tags=("streaming", "join"),
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.streaming import interval_join_stream

    ev = _events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = interval_join_stream(
        clicks, purchases, key="user_id", within="1 hour", delay="2 days"
    )
    out = _run(joined, "append")
    return out.select("l_key", "l_event", "r_event")


@defquery(
    "stream_raster_daily",
    None,  # custom streaming source — rows-only check
    doc="GeoTIFF drop-directory streaming source (geotiff_stream): decode "
    "each day's raster as it arrives, daily per-file pixel aggregates",
    tags=("streaming", "raster", "source"),
)
def q_stream_raster_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's daily raster cadence as Structured Streaming: the
    fixture corpus stands in for the drop directory; availableNow drains
    it exactly once and aggregates per day."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.raster import ensure_demo_rasters
    from shared_etl_pipelines_spark.sources.raster_stream import (
        GeoTiffStreamDataSource,
    )

    spark.dataSource.register(GeoTiffStreamDataSource)
    drop_dir = ensure_demo_rasters()
    px = spark.readStream.format("geotiff_stream").option("path", drop_dir).load()
    agg = px.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_px"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return _run(agg, "complete").orderBy("day")


def _documents_stream(spark: SparkSession, sf_dir: str):
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


@defquery(
    "stream_new_doc_dedup",
    None,  # stream-static anti-join emission is streaming-only semantics
    doc="streaming ingestion dedup: arriving documents anti-joined "
    "against the static corpus' content hashes (the streaming twin of "
    "incremental_dedup) — only never-seen documents pass through",
    tags=("streaming", "dedup", "llm"),
)
def q_stream_new_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static LEFT ANTI join: the arrival-time form of
    operators/dedup.py incremental_dedup. The static side (the already-
    ingested corpus, here docs with doc_id % 10 == 0) is re-resolved per
    micro-batch and broadcast; no streaming state is kept — the hash
    membership check is stateless per batch, which is what makes this
    shape safe at any stream length."""
    from pyspark.sql import functions as F

    stream = _documents_stream(spark, sf_dir)
    corpus = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % 10 == 0)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
    )
    novel = stream.withColumn("content_hash", F.md5("text")).join(
        corpus, "content_hash", "left_anti"
    )
    out = _run(novel.select("doc_id", "source"), "append")
    return out
