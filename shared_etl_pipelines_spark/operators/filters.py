"""Filter / predicate operators.

The reference's predicate surface (SURVEY.md §2.5):
- attribute equality ``key = value`` (geo_clip_raster_by_polygon,
  pipelines/prism/stage-ts-ppt-day-state.yml:31-32: STUSPS = 'MI'),
- categorical IN-mask -> 0/1 indicator (geo_raster_value_mask,
  pipelines/prism/prism-mi-corn-ppt-county.yml:41-49: include_values "1"),
- numeric range predicate (stac query_json eo:cloud_cover < 20,
  pipelines/sentinel/download-sentinel2-l2a-michigan.yml:50),
- temporal filter target_year (geo_raster_running_window,
  pipelines/prism/stage-ts-ppt-day-mi-rollsum-3d.yml:30).

All are plain Column predicates so Catalyst pushes them into the parquet
scan (check: PushedFilters in .explain("formatted")).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attribute_filter(df: DataFrame, key: str, value: object) -> DataFrame:
    """``key = value`` attribute selection (G1's selector contract)."""
    return df.filter(F.col(key) == F.lit(value))


def value_mask(
    df: DataFrame,
    value_col: str,
    include_values: list | str,
    mask_col: str = "mask",
    nodata: object | None = None,
) -> DataFrame:
    """Categorical IN-predicate -> 0/1 indicator column (G5).

    ``include_values`` may be the reference's comma-string form ("1" or
    "1,5") or a Python list. ``nodata`` values map to NULL, mirroring the
    dst_nodata: 255 convention (prism-mi-corn-ppt-county.yml:57).
    """
    if isinstance(include_values, str):
        vals = [v.strip() for v in include_values.split(",") if v.strip()]
    else:
        vals = list(include_values)
    # cast literals to the column's type via comparison semantics
    c = F.col(value_col)
    mask = F.when(c.isin(vals), F.lit(1)).otherwise(F.lit(0))
    if nodata is not None:
        mask = F.when(c == F.lit(nodata), F.lit(None)).otherwise(mask)
    return df.withColumn(mask_col, mask)


def range_filter(
    df: DataFrame,
    col: str,
    lo: object | None = None,
    hi: object | None = None,
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Half-open/closed range predicate (S5's cloud-cover ``lt`` query)."""
    c = F.col(col)
    pred: Column | None = None
    if lo is not None:
        p = c >= F.lit(lo) if lo_inclusive else c > F.lit(lo)
        pred = p if pred is None else pred & p
    if hi is not None:
        p = c <= F.lit(hi) if hi_inclusive else c < F.lit(hi)
        pred = p if pred is None else pred & p
    return df if pred is None else df.filter(pred)


def temporal_filter(df: DataFrame, date_col: str, target_year: int) -> DataFrame:
    """G2's target_year restriction — applied AFTER windowing so trailing
    windows keep their cross-year lookback (SURVEY.md §7.7)."""
    return df.filter(F.year(F.col(date_col)) == F.lit(int(target_year)))
