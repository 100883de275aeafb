"""Grid resampling: resolution-changing re-aggregation.

Reference: geo_raster_reproject.py with ``resampling: average`` — resample
a 30 m binary mask onto the 800 m PRISM grid, producing a per-coarse-cell
FRACTION in [0,1] (pipelines/prism/prism-mi-corn-ppt-county.yml:50-60;
dst_nodata 255 -> NULL).

For grid-aligned rasters this is pure arithmetic + groupBy: assign each
fine cell its coarse cell id (integer division by the resolution ratio)
and average. One shuffle on the coarse key; output is k² times smaller
than input, so this is exactly the reference's manual partial-aggregate
pushdown (SURVEY.md §4 P9) — shrink BEFORE joining with the daily stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regrid_average(
    df: DataFrame,
    fine_cols: tuple[str, str],
    factor: int,
    value_col: str,
    coarse_cols: tuple[str, str] = ("cy", "cx"),
    out_col: str = "fraction",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Average ``value_col`` from a fine grid onto a grid coarsened by
    ``factor`` along both axes. NULL values (nodata) are ignored by avg,
    matching average-resampling over nodata pixels."""
    fy, fx = fine_cols
    cy, cx = coarse_cols
    keys = list(extra_keys or [])
    out = df.withColumn(cy, F.floor(F.col(fy) / factor)).withColumn(
        cx, F.floor(F.col(fx) / factor)
    )
    return out.groupBy(*keys, cy, cx).agg(F.avg(F.col(value_col)).alias(out_col))
