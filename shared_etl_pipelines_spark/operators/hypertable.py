"""Hypertable rollup: multi-resolution time-bucket aggregates in a cascade.

TimescaleDB-style continuous aggregates, re-expressed as a Spark plan:
the raw table is aggregated ONCE at the finest resolution; every coarser
resolution re-aggregates the next-finer level's partials instead of
rescanning raw rows. sum/count/min/max are decomposable so the cascade is
exact; avg is derived as sum/count at the end.

At 100 TB this matters: the hourly level processes the full table (one
shuffle on a uniformly distributed bucket key with map-side combine); the
daily level then sees ~1/24th the rows, monthly ~1/720th — each coarser
stage is orders of magnitude cheaper than an independent scan-per-
resolution plan, and the whole cascade is one lazy DAG Spark pipelines
without materializing intermediate levels.

Reference counterpart: none — the reference's temporal aggregation is
fixed-grain (daily county CSVs, pipelines/prism/county_daily_aggregate.yml);
this generalizes it to the multi-resolution rollup a training-data /
telemetry pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# coarse-to-fine ordering; each resolution must be reachable from the next
# finer one by date_trunc (true for this calendar hierarchy)
RESOLUTIONS = ("minute", "hour", "day", "month", "year")


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    start: str,
    end: str,
) -> DataFrame:
    """Dense daily spine per key with last-observation-carried-forward.

    TimescaleDB's time_bucket_gapfill + locf(), as a Spark plan: the
    (keys × days) spine comes from a `sequence()` explode — rows, not a
    driver loop — left-joined to the observed daily values, then filled
    with `last(value, ignorenulls=True)` over an expanding window.

    Scale notes: the spine is |keys| × |days| rows generated executor-side
    (no shuffle); the left join hashes on (key, day) — same key as the
    upstream daily aggregate, so AQE coalesces them; the LOCF window
    reuses the key partitioning. Days before a key's first observation
    remain NULL (no look-behind fabrication). ``was_gap`` marks filled
    rows.

    Columns out: key, day (DATE), ``{value_col}_locf``, was_gap.
    """
    days = F.explode(
        F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
    ).alias(day_col)
    spine = df.select(key_col).distinct().select(F.col(key_col), days)
    joined = spine.join(df, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.col(day_col),
        F.last(value_col, ignorenulls=True).over(w).alias(f"{value_col}_locf"),
        F.when(F.col(value_col).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_gap"),
    )


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    start: str,
    end: str,
) -> DataFrame:
    """Dense daily spine per key with LINEAR interpolation across gaps.

    TimescaleDB's time_bucket_gapfill + interpolate(), as one Spark plan:
    the spine join is identical to :func:`gap_fill_locf`; the fill then
    needs BOTH neighbors of each gap — previous observed (value, day) from
    an expanding window, next observed (value, day) from the reversed
    expanding window — and fills
    ``prev + (next - prev) * (day - prev_day) / (next_day - prev_day)``.

    Edges (before the first / after the last observation) have only one
    neighbor and stay NULL — interpolation never extrapolates. Both window
    passes reuse the same (key, day) sort, so the physical plan sorts once
    per direction within an already key-partitioned exchange; at scale
    this is two window stages over the spine, no extra shuffle beyond the
    one the spine join already required.

    Columns out: key, day (DATE), ``{value_col}_interp``, was_gap.
    """
    days = F.explode(
        F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
    ).alias(day_col)
    spine = df.select(key_col).distinct().select(F.col(key_col), days)
    joined = spine.join(df, [key_col, day_col], "left")

    w_back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    observed_day = F.when(F.col(value_col).isNotNull(), F.col(day_col))
    prev_v = F.last(value_col, ignorenulls=True).over(w_back)
    prev_d = F.last(observed_day, ignorenulls=True).over(w_back)
    next_v = F.first(value_col, ignorenulls=True).over(w_fwd)
    next_d = F.first(observed_day, ignorenulls=True).over(w_fwd)

    span = F.datediff(next_d, prev_d)
    offset = F.datediff(F.col(day_col), prev_d)
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double")).otherwise(
        prev_v + (next_v - prev_v) * offset / span
    )
    return joined.select(
        F.col(key_col),
        F.col(day_col),
        interp.alias(f"{value_col}_interp"),
        F.when(F.col(value_col).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_gap"),
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: tuple[str, ...] = ("hour", "day", "month"),
    materialize_partials: bool = True,
) -> DataFrame:
    """Cascade rollup of ``value_col`` over calendar buckets.

    Returns one row per (resolution, bucket) with columns
    ``resolution, bucket ('yyyy-MM-dd HH:mm:ss' string), n, sum_value,
    min_value, max_value, avg_value``. ``resolutions`` must be a subset of
    RESOLUTIONS; order given is ignored — computed fine-to-coarse.

    ``materialize_partials`` persists the finest-level partials (one row
    per finest bucket — tiny) and materializes them eagerly; without it,
    Spark's lineage would rescan the raw table once per union branch and
    the cascade would save nothing. At warehouse scale the same role is
    played by writing the finest level to its own table and building
    coarser levels from that.
    """
    unknown = set(resolutions) - set(RESOLUTIONS)
    if unknown:
        raise ValueError(f"unknown resolutions: {sorted(unknown)}")
    ordered = [r for r in RESOLUTIONS if r in resolutions]  # fine -> coarse

    finest = ordered[0]
    level = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    if materialize_partials and len(ordered) > 1:
        level = level.persist()
        level.count()  # eager: union branches must not race the cache

    def finalize(partials: DataFrame, res: str) -> DataFrame:
        return partials.select(
            F.lit(res).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            "sum_value",
            "min_value",
            "max_value",
            (F.col("sum_value") / F.col("n")).alias("avg_value"),
        )

    out = finalize(level, finest)
    for res in ordered[1:]:
        # re-aggregate the previous (finer) level's partials — decomposable
        level = level.groupBy(
            F.date_trunc(res, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out = out.unionByName(finalize(level, res))
    return out


def holt_linear_smooth(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per series,
    alpha = beta = 0.5 — the classic short-horizon forecaster for
    telemetry/revenue series, one step up from ewma_daily_value's
    single smoothing.

        l_t = 0.5*y_t + 0.5*(l_{t-1} + b_{t-1})
        b_t = 0.5*(l_t - l_{t-1}) + 0.5*b_{t-1}
        init: l_1 = y_1, b_1 = 0;  fitted_t = l_{t-1} + b_{t-1}

    The recursion is inherently sequential WITHIN a series, so each
    series folds as a bounded in-memory array (collect_list -> one
    ``F.aggregate`` pass, JVM-side higher-order function — no Python,
    no window): correct whenever one series' points fit one executor,
    which is the hypertable regime (a 100 TB table is millions of
    SHORT series — the groupBy distributes across them; the raw rows
    were already collapsed to per-bucket aggregates upstream). The
    halved coefficients are exact in binary, so both the engine and a
    sequential SQL replay (recursive CTE) walk identical IEEE doubles.

    Emits one row per point from the second onward: the one-step-ahead
    ``fitted`` forecast and the post-update ``level`` / ``trend``.
    """
    # The F.expr accumulator below declares o:string, so a date/
    # timestamp/int order_col would mismatch array_append's struct type
    # (ADVICE r7 #2). Sort on the TYPED key (string sort would misorder
    # ints), then stringify o inside the sorted array for the fold; the
    # original type is restored on the way out.
    order_type = df.schema[order_col].dataType.simpleString()
    series = (
        df.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("series")
        )
        .filter(F.size("series") >= 2)
        .withColumn(
            "series",
            F.expr(
                "transform(series, s -> struct(CAST(s.o AS STRING) AS o,"
                " s.v AS v))"
            ),
        )
    )
    rows = F.expr(
        """
        aggregate(
          slice(series, 2, size(series) - 1),
          struct(
            element_at(series, 1).v AS l,
            CAST(0.0 AS DOUBLE) AS b,
            CAST(array() AS array<struct<o:string, y:double, fitted:double,
                                         level:double, trend:double>>) AS rows
          ),
          (acc, x) -> struct(
            0.5D * x.v + 0.5D * (acc.l + acc.b) AS l,
            0.5D * ((0.5D * x.v + 0.5D * (acc.l + acc.b)) - acc.l)
              + 0.5D * acc.b AS b,
            array_append(acc.rows, struct(
              x.o AS o,
              x.v AS y,
              acc.l + acc.b AS fitted,
              0.5D * x.v + 0.5D * (acc.l + acc.b) AS level,
              0.5D * ((0.5D * x.v + 0.5D * (acc.l + acc.b)) - acc.l)
                + 0.5D * acc.b AS trend)) AS rows
          ),
          acc -> acc.rows
        )
        """
    )
    return series.select(*key_cols, F.explode(rows).alias("r")).select(
        *key_cols,
        F.col("r.o").cast(order_type).alias(order_col),
        F.col("r.y").alias("y"),
        F.col("r.fitted").alias("fitted"),
        F.col("r.level").alias("level"),
        F.col("r.trend").alias("trend"),
    )
