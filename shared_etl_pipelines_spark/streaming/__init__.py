"""Structured Streaming mode: the reference's incremental daily-append
cadence (SURVEY.md §7.6) as file-source streams with event-time windows
and checkpointed state."""

from shared_etl_pipelines_spark.streaming.sources import read_drop_dir
from shared_etl_pipelines_spark.streaming.windows import (
    dedup_stream,
    interval_join_stream,
    running_totals,
    session_agg,
    sliding_agg,
    tumbling_agg,
    welford_stats,
)

__all__ = [
    "read_drop_dir",
    "dedup_stream",
    "interval_join_stream",
    "running_totals",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
    "welford_stats",
]
