"""Join operators.

The reference's joins are implicit/spatial/positional (SURVEY.md §2.5):
- clip = semi-join of cells against polygons selected by attribute
  (geo_clip_raster_by_polygon, pipelines/prism/stage-ts-ppt-day-state.yml:24-35),
- elementwise multiply = cell-aligned equi-join against a static weight
  raster (geo_raster_multiply, prism-mi-corn-ppt-county.yml:61-70).

We expose them as real joins with explicit broadcast hints: polygon/zone
and weight sides are tiny (52 states, ~3.2k counties, one weight grid per
state) versus billions of cells, so the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def clip_semi_join(
    cells: DataFrame,
    zones: DataFrame,
    on: list[str],
    key: str | None = None,
    value: object | None = None,
    broadcast_zones: bool = True,
) -> DataFrame:
    """Keep cells whose (on) keys appear in zones, optionally after the
    ``key = value`` attribute selection (G1: STUSPS='MI').

    left_semi join: no columns from the zone side, no duplicate blow-up,
    and with broadcast the big side is never shuffled.
    """
    z = zones.filter(F.col(key) == F.lit(value)) if key is not None else zones
    z = z.select(*on).dropDuplicates(on)
    if broadcast_zones:
        z = F.broadcast(z)
    return cells.join(z, on=on, how="left_semi")


def multiply_join(
    values: DataFrame,
    weights: DataFrame,
    on: list[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_value",
    broadcast_weights: bool = True,
) -> DataFrame:
    """Cell-aligned equi-join + elementwise product (G7).

    The weight side is a single static grid — broadcast it so the daily
    stack streams through map-side. Inner join drops cells with no weight,
    matching raster nodata propagation.
    """
    w = F.broadcast(weights) if broadcast_weights else weights
    return values.join(w, on=on, how="inner").withColumn(
        out_col, F.col(value_col) * F.col(weight_col)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "inner",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` per key (beyond-reference relational coverage;
    matches DuckDB's ASOF JOIN semantics).

    Implemented union-merge style, NOT as a range join: tag both sides,
    union, then one window sort per key carries each right value forward
    with last(ignorenulls). Cost is a single shuffle+sort of |L|+|R| rows
    — no per-key row explosion, so a key with millions of left rows and
    millions of right rows stays linear. Right rows are deduplicated to
    one per (key, ts) first — greatest ``right_tiebreak`` (default: the
    value columns themselves) wins, keeping ties deterministic.
    """
    tb = [right_tiebreak] if right_tiebreak else value_cols
    rdedup_w = Window.partitionBy(*on, right_ts).orderBy(
        *[F.col(c).desc() for c in tb]
    )
    r = (
        right.withColumn("_rn", F.row_number().over(rdedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    lcols = [c for c in left.columns]
    r_tagged = r.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in on],
    )
    merged = r_tagged.unionByName(l_tagged)
    # right rows sort before left rows at equal ts => <= semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        merged = merged.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = merged.filter(F.col("_is_right") == 0).select(
        *on,
        *[F.col(c) for c in lcols if c not in on],
        *[F.col(f"_r_{c}").alias(c) for c in value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(value_cols[0]).isNotNull())
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join over ``[start, end)`` on an integer domain
    (dates → epoch days, timestamps → epoch seconds), bucketed so it runs
    as an equi-join (beyond-reference relational coverage).

    A naive theta join (``p >= start AND p < end``) plans as a broadcast
    nested loop — quadratic work at scale. Instead each interval is
    exploded to every width-w bucket it overlaps and each point hashes to
    exactly ONE bucket, so candidate generation is a hash equi-join on
    ``_bucket`` followed by the exact range refinement. Each matching
    (point, interval) pair arises from exactly one bucket — no dedup
    needed. Cost: |points| + |intervals| * (span/w + 1) exploded rows,
    shuffled once on a uniformly distributed key. Pick ``bucket_width``
    near the median interval span; AQE absorbs residual bucket skew.
    Intervals may overlap each other arbitrarily (a point can match many).
    """
    p = points.withColumn("_bucket", F.floor(F.col(point_col) / bucket_width))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor((F.col(end_col) - 1) / bucket_width),
            )
        ),
    )
    out = p.join(iv, on=["_bucket"], how=how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return out.drop("_bucket")


def enrich_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Generic fact⋈dimension enrichment with an explicit broadcast hint —
    the shape of every polygon-attribute lookup in the reference."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)
