"""Window operators: trailing rolling metrics and standardized anomalies.

Reference contracts:
- geo_raster_running_window.py — w-day trailing SUM per cell, windows
  w ∈ {3,7,14,30}, input spans all years but output restricted to
  target_year, i.e. the window looks back across the year boundary
  (pipelines/prism/stage-ts-ppt-day-mi-rollsum-3d.yml:22-33 and the
  -7d/-14d/-30d siblings).
- geo_raster_spi.py — ``method: zscore``: per cell standardize each value
  against its climatology (pipelines/prism/stage-ts-ppt-day-mi-spi-3d.yml:20-30).

Scale notes: a window over Window.partitionBy(keys).orderBy(date) is ONE
shuffle on the partition keys followed by an in-partition sort; with
(y, x) cell keys the cardinality is huge and uniform — no skew. A 30-row
trailing frame is O(1) state per row in Spark's sliding-frame evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METRICS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def rolling_metric(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    value_col: str,
    window: int,
    metric: str = "sum",
    out_col: str | None = None,
    target_year: int | None = None,
    date_col: str | None = None,
) -> DataFrame:
    """Trailing ``window``-row metric per partition (G2).

    rowsBetween(-(w-1), 0) matches the reference's w-day windows given one
    row per (cell, day). ``target_year`` filters AFTER the window so the
    first w-1 days of the year still see the previous year's tail.
    """
    fn = _METRICS[metric.lower()]
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(-(window - 1), 0)
    )
    name = out_col or f"{metric}_{window}"
    out = df.withColumn(name, fn(F.col(value_col)).over(w))
    if target_year is not None:
        out = out.filter(F.year(F.col(date_col or order_col)) == F.lit(int(target_year)))
    return out


def zscore(
    df: DataFrame,
    partition_cols: list[str],
    value_col: str,
    out_col: str = "zscore",
    ddof: int = 1,
) -> DataFrame:
    """Standardized anomaly (G3, method=zscore): (x - mean)/stddev over the
    climatology partition. For SPI the partition is (cell, day-of-year) —
    build that column with `F.dayofyear` first (leap-day policy: Feb-29
    coalesces into day-of-year of Feb-28 via `doy_non_leap`).

    Single window, no ordering -> one shuffle, whole-partition frame.
    """
    w = Window.partitionBy(*partition_cols)
    mean = F.mean(F.col(value_col)).over(w)
    sd = (F.stddev_samp if ddof == 1 else F.stddev_pop)(F.col(value_col)).over(w)
    return df.withColumn(out_col, (F.col(value_col) - mean) / sd)


def sessionize(
    df: DataFrame,
    partition_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``. session_id is the running
    count of session starts per key (1-based).

    lag + cumulative sum over one key-partitioned sort — a single shuffle;
    the streaming analog is F.session_window (streaming/windows.py).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_start = (
        prev.isNull()
        | ((F.col(ts_col).cast("long") - prev.cast("long")) > gap_seconds)
    ).cast("long")
    cum = Window.partitionBy(*partition_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(is_start).over(cum))


def doy_non_leap(date_col: str):
    """Day-of-year with Feb-29 mapped onto Feb-28's ordinal so that a
    per-day-of-year climatology has stable group sizes across leap years
    (SURVEY.md §7.7 leap-day policy)."""
    d = F.col(date_col)
    doy = F.dayofyear(d)
    is_leap = (F.year(d) % 4 == 0) & ((F.year(d) % 100 != 0) | (F.year(d) % 400 == 0))
    return F.when(is_leap & (doy >= 60), doy - 1).otherwise(doy)


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row_number: 1..N in ``order_cols`` order WITHOUT
    the single-partition window Spark plans for Window.orderBy(...).

    Pattern: range-repartition on the ordering (a sampled range shuffle —
    every partition gets a contiguous key range), sort within partitions,
    then add each partition's cumulative row offset to an intra-partition
    row_number. The per-partition counts are a driver collect of
    #partitions rows (bounded, not data-sized); the window runs
    partitioned by spark_partition_id, i.e. fully parallel. The sorted
    frame is persisted so the count pass and the final pass see identical
    partitioning.

    ``order_cols`` must be a total order (append a unique tie-breaker) or
    ranks are nondeterministic.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["c"] for r in ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.lit(0)
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(off_expr)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return ordered.withColumn(
        out_col, (F.row_number().over(w) + off_expr).cast("long")
    ).drop("_pid")


def global_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum of ``value_col`` in
    ``order_cols`` order — the global-window cumsum WITHOUT Spark's
    single-partition exchange (r9; same two-phase shape as
    global_row_number): range-repartition on the ordering, per-partition
    value sums collected to the driver (#partitions rows, bounded),
    exclusive offsets broadcast back as a CASE expression, and the
    intra-partition running sum computed by a window partitioned by
    spark_partition_id — fully parallel at any size.

    Exclusive semantics (row's own value NOT included) because that is
    what size-budgeted packing needs: bin = cum // budget puts the
    boundary-straddling item in the earlier bin. ``order_cols`` must be
    a total order."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ordered.groupBy("_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)
    off_expr = F.lit(0)
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(off_expr)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(value_col).over(w), F.lit(0))
    return ordered.withColumn(
        out_col, (cum + off_expr).cast("long")
    ).drop("_pid")


def global_ntile(
    df: DataFrame,
    order_cols: list,
    n_buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed NTILE: equal-frequency buckets with exact NTILE
    semantics (first N % Q buckets get the extra row), built on
    global_row_number — no single-partition exchange at any size.
    """
    ranked = global_row_number(df, order_cols, out_col="_grn", num_partitions=num_partitions)
    total = ranked.count()  # cheap: the ranked frame is persisted
    big = total // n_buckets + 1
    small = total // n_buckets
    r = total % n_buckets
    cutover = big * r  # rows 1..cutover live in the r larger buckets
    bucket = F.when(
        F.col("_grn") <= cutover, ((F.col("_grn") - 1) / big).cast("long") + 1
    ).otherwise(
        r + ((F.col("_grn") - cutover - 1) / F.lit(max(small, 1))).cast("long") + 1
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop("_grn")


def partial_topk(
    df: DataFrame,
    keys: list[str],
    value: str,
    tiebreak: str,
    k: int,
) -> DataFrame:
    """Exact top-k per group WITHOUT sorting whole groups in the window:
    each Arrow batch first keeps only its own per-key top-k (any row in
    the true global top-k is necessarily in its batch's top-k, so
    pruning loses nothing), then the final ranking window runs over at
    most k * n_batches candidates per key instead of the full group.

    This is the map-side-combine form of the ranking window — the
    difference between shuffling every row of a hot group and shuffling
    k per batch at 100 TB. Ties break on ``tiebreak`` ascending, same
    order as the final window, so the result is deterministic and
    row-identical to the plain window form (tested).
    """

    def shrink(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([value, tiebreak], ascending=[False, True])
            yield pdf.groupby(keys, sort=False, dropna=False).head(k)

    pruned = df.mapInPandas(shrink, df.schema)
    w = Window.partitionBy(*keys).orderBy(
        F.col(value).desc(), F.col(tiebreak)
    )
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
