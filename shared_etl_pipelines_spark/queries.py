"""Named query registry: every operator exposed as (Spark builder, oracle SQL).

This is the engine's correctness surface. Each entry pairs a PySpark
DataFrame builder with the ANSI-SQL statement DuckDB runs over the same
parquet tables; the driver hash-compares the two at sf0.01
(order-insensitive, columns sorted by name). Conventions that make the
hashes line up:

- every computed column is aliased IDENTICALLY in both forms;
- every floating-point output is rounded to 4 decimals on BOTH sides
  (different engines sum in different orders — semantics identical,
  last-ulp noise removed);
- timestamps are projected as DATE or epoch seconds (Spark session TZ is
  pinned UTC to match DuckDB's naive timestamps);
- window orderings always carry a unique tie-breaker column.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shared_etl_pipelines_spark.operators.aggregates import (
    agg_exprs,
    weighted_zonal_aggregate,
    zonal_aggregate,
)
from shared_etl_pipelines_spark.operators.filters import value_mask
from shared_etl_pipelines_spark.operators.joins import clip_semi_join, multiply_join
from shared_etl_pipelines_spark.operators.resample import regrid_average
from shared_etl_pipelines_spark.operators.setops import union_all
from shared_etl_pipelines_spark.operators.windows import rolling_metric, zscore
from shared_etl_pipelines_spark.sources.tables import load_table


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QueryDef] = {}


def defquery(name: str, sql: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, sql=sql, doc=doc, tags=tags)
        return fn

    return deco


def round_floats(df: DataFrame, ndigits: int = 4) -> DataFrame:
    """Round every float/double column — applied to all query outputs so the
    DuckDB comparison is insensitive to summation order."""
    cols = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, (T.DoubleType, T.FloatType)):
            cols.append(F.round(F.col(f_.name).cast("double"), ndigits).alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    return df.select(*cols)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# G4 — zonal statistics (FLAGSHIP): join + groupBy + declared multi-agg list
# Reference: geo_county_raster_aggregate.py,
# pipelines/prism/county_daily_aggregate.yml:24-36 (agg list at :15:
# "min, p5, q1, med, avg, q3, p95, max"; output cols {value_prefix}_{agg}).
# TPC-H casting: cells = lineitem prices, zones = order priorities.
# ---------------------------------------------------------------------------
@defquery(
    "zonal_stats",
    """
    SELECT o_orderpriority AS zone,
           ROUND(MIN(l_extendedprice), 4)                     AS price_min,
           ROUND(quantile_cont(l_extendedprice, 0.05), 4)     AS price_p5,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4)     AS price_q1,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4)     AS price_med,
           ROUND(AVG(l_extendedprice), 4)                     AS price_avg,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4)     AS price_q3,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4)     AS price_p95,
           ROUND(MAX(l_extendedprice), 4)                     AS price_max,
           COUNT(*)                                           AS n_cells
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="G4 zonal statistics: exact-percentile multi-agg per zone",
    tags=("G4", "aggregate", "percentile", "join"),
)
def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    cells = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey, "inner")
    out = cells.groupBy(F.col("o_orderpriority").alias("zone")).agg(
        *agg_exprs("l_extendedprice", "min,p5,q1,med,avg,q3,p95,max", "price"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return round_floats(out)
