"""Operator library: pure ``DataFrame -> DataFrame`` functions.

Every operator here re-expresses a plugin contract observed in the
reference (SURVEY.md §2 cites each invocation site) or a north-star
LLM-data operation, as declarative DataFrame transformations so that
Catalyst owns the physical plan (pushdown, broadcast, AQE).
"""

from shared_etl_pipelines_spark.operators.aggregates import (
    agg_exprs,
    parse_agg_list,
    weighted_zonal_aggregate,
    zonal_aggregate,
)
from shared_etl_pipelines_spark.operators.filters import attribute_filter, value_mask
from shared_etl_pipelines_spark.operators.sampling import stratified_sample, uniform_hash
from shared_etl_pipelines_spark.operators.scd import scd2_merge
from shared_etl_pipelines_spark.operators.windows import (
    global_ntile,
    global_row_number,
    rolling_metric,
    zscore,
)

__all__ = [
    "agg_exprs",
    "parse_agg_list",
    "zonal_aggregate",
    "weighted_zonal_aggregate",
    "attribute_filter",
    "value_mask",
    "rolling_metric",
    "zscore",
    "global_row_number",
    "global_ntile",
    "stratified_sample",
    "uniform_hash",
    "scd2_merge",
]
