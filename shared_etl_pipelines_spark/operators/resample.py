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


def affine_regrid(
    df: DataFrame,
    value_col: str,
    src_transform: tuple[float, float, float, float, float, float],
    dst_transform: tuple[float, float, float, float, float, float],
    dst_shape: tuple[int, int],
    src_cols: tuple[str, str] = ("y", "x"),
    out_cols: tuple[str, str] = ("dy", "dx"),
    supersample: int = 2,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """True affine/CRS regrid between ARBITRARY grids — rotation,
    shear, non-integer resolution ratios, offset misalignment (the
    general form of geo_raster_reproject's ``resampling: average``,
    pipelines/prism/prism-mi-corn-ppt-county.yml:50-60, which
    ``regrid_average`` handles only for nested axis-aligned grids).

    Transforms are GDAL-style affines mapping PIXEL (col, row) to world:
    ``x = a*col + b*row + c;  y = d*col + e*row + f`` for
    ``(a, b, c, d, e, f)``. Each source pixel is represented by
    ``supersample**2`` interior sample points (centers of the s x s
    subdivision), pushed through src-affine then inverse-dst-affine and
    floor-assigned to a destination cell; the destination value is the
    average of contributing samples — for a 0/1 mask input that average
    IS the G6 area-fraction in [0, 1], converging to the exact overlap
    integral as s grows (gdalwarp computes 'average' by the same
    point-sampling scheme). Emits ``(dy, dx, n_pts, avg_value)``.

    Scale shape: a pure projection with an s^2 row fan-out (codegen
    ``explode(sequence)``, no Python), then ONE shuffle on the
    destination key whose cardinality is the dst grid — the same
    shrink-before-join posture as regrid_average. No driver-side state;
    100x more pixels = 100x more map work, same reduce width.
    """
    a, b, c0, d, e, f0 = (float(v) for v in src_transform)
    ta, tb, tc, td, te, tf = (float(v) for v in dst_transform)
    det = ta * te - tb * td
    if det == 0:
        raise ValueError("dst_transform is singular")
    h, w = dst_shape
    s = int(supersample)
    if s < 1:
        raise ValueError("supersample must be >= 1")
    ry, rx = src_cols
    oy, ox = out_cols
    keys = list(extra_keys or [])

    sub = df.withColumn(
        "_sj", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))
    ).withColumn("_sk", F.explode(F.sequence(F.lit(0), F.lit(s - 1))))
    # subpoint pixel coords: col + (2k+1)/(2s), row + (2j+1)/(2s) — odd
    # numerators keep samples strictly interior (never on a cell edge)
    cs = F.col(rx) + (2 * F.col("_sk") + 1) / F.lit(2.0 * s)
    rs = F.col(ry) + (2 * F.col("_sj") + 1) / F.lit(2.0 * s)
    wx = F.lit(a) * cs + F.lit(b) * rs + F.lit(c0)
    wy = F.lit(d) * cs + F.lit(e) * rs + F.lit(f0)
    # inverse dst affine
    dc = (F.lit(te) * (wx - F.lit(tc)) - F.lit(tb) * (wy - F.lit(tf))) / F.lit(det)
    dr = (F.lit(-td) * (wx - F.lit(tc)) + F.lit(ta) * (wy - F.lit(tf))) / F.lit(det)
    mapped = sub.select(
        *keys,
        F.floor(dr).cast("long").alias(oy),
        F.floor(dc).cast("long").alias(ox),
        F.col(value_col).alias("_v"),
    ).filter(
        (F.col(oy) >= 0) & (F.col(oy) < h) & (F.col(ox) >= 0) & (F.col(ox) < w)
    )
    return mapped.groupBy(*keys, oy, ox).agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.avg("_v").alias("avg_value"),
    )
