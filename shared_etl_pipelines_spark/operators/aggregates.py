"""Aggregation operators.

The reference's zonal-statistics plugins declare their aggregate set as a
comma list ``min, p5, q1, med, avg, q3, p95, max``
(geo_county_raster_aggregate, pipelines/prism/county_daily_aggregate.yml:15)
and name output columns ``{value_prefix}_{agg}``. We implement the same
vocabulary as a parser from that list to Spark aggregate expressions.

Percentiles are EXACT (`F.percentile`, linear interpolation) to match the
reference's analytic intent and the DuckDB oracle (`quantile_cont`). At
100 TB exact percentiles require a full sort per group — pass
``approx=True`` to switch every percentile to `percentile_approx`
(t-digest-style sketch, single pass, mergeable across executors), which is
the cluster-scale default.

Weighted zonal aggregation re-expresses geo_county_weighted_raster_aggregate
(pipelines/prism/prism-mi-corn-ppt-county.yml:71-85): sum(v*w)/sum(w) per
zone — a map-side-combinable pair of sums, no custom UDAF needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate-name -> percentile fraction for the reference's vocabulary
_PCT = {
    "p1": 0.01,
    "p5": 0.05,
    "p10": 0.10,
    "q1": 0.25,
    "med": 0.50,
    "q3": 0.75,
    "p90": 0.90,
    "p95": 0.95,
    "p99": 0.99,
}

_SIMPLE = {
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "mean": F.avg,
    "sum": F.sum,
    "count": F.count,
    "stddev": F.stddev_samp,
    "stddev_pop": F.stddev_pop,
    "var": F.var_samp,
    "first": F.first,
    "last": F.last,
}


def parse_agg_list(aggregations: str | list[str]) -> list[str]:
    """Normalize ``"min, p5, q1"`` or a list into clean agg names."""
    if isinstance(aggregations, str):
        parts = aggregations.split(",")
    else:
        parts = list(aggregations)
    return [p.strip().lower() for p in parts if p.strip()]


def agg_exprs(
    value_col: str,
    aggregations: str | list[str],
    value_prefix: str = "",
    approx: bool = False,
) -> list[Column]:
    """Build aggregate expressions for the reference's declared-agg-list
    contract. Output aliases are ``{value_prefix}_{agg}`` (or ``{agg}``)."""
    cols: list[Column] = []
    v = F.col(value_col)
    for name in parse_agg_list(aggregations):
        alias = f"{value_prefix}_{name}" if value_prefix else name
        if name in _PCT:
            frac = _PCT[name]
            c = F.percentile_approx(v, frac) if approx else F.percentile(v, frac)
        elif name in _SIMPLE:
            c = _SIMPLE[name](v)
        elif name.startswith("p") and name[1:].replace(".", "", 1).isdigit():
            frac = float(name[1:]) / 100.0
            c = F.percentile_approx(v, frac) if approx else F.percentile(v, frac)
        else:
            raise ValueError(f"unknown aggregation: {name!r}")
        cols.append(c.alias(alias))
    return cols


def zonal_aggregate(
    cells: DataFrame,
    zone_cols: list[str],
    value_col: str,
    aggregations: str | list[str] = "min,p5,q1,med,avg,q3,p95,max",
    value_prefix: str = "",
    approx: bool = False,
) -> DataFrame:
    """Zonal statistics = GROUP BY zone + declared multi-aggregate list.

    Reference: geo_county_raster_aggregate.py invocation,
    pipelines/prism/county_daily_aggregate.yml:24-36 (agg list line 15).
    Scale note: one shuffle on the zone key with map-side partial
    aggregation for the algebraic aggs; percentiles are the sort cost —
    use approx=True at cluster scale.
    """
    return cells.groupBy(*zone_cols).agg(
        *agg_exprs(value_col, aggregations, value_prefix, approx)
    )


def weighted_zonal_aggregate(
    cells: DataFrame,
    zone_cols: list[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wavg",
) -> DataFrame:
    """Weighted mean per zone: sum(v*w)/sum(w).

    Reference: geo_county_weighted_raster_aggregate.py,
    pipelines/prism/prism-mi-corn-ppt-county.yml:71-85. Both sums combine
    map-side, so the shuffle carries two doubles per (zone) group — this
    plan is flat in data volume and survives any scale-up.
    """
    v, w = F.col(value_col), F.col(weight_col)
    return cells.groupBy(*zone_cols).agg(
        (F.sum(v * w) / F.sum(w)).alias(out_col),
        F.sum(w).alias(f"{out_col}_weight"),
    )
