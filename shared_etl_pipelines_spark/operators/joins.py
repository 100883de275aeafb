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

from pyspark.sql import DataFrame
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
