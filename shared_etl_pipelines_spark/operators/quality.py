"""Data-quality operators: column profiling and declarative expectations.

Generalizes the reference's profiling/validation surface — `vector_facts`
(pipelines/tiger/county.yml:36-41) profiles a dataset post-hoc, and the
pipeline layer's skip-if-exists/`ON_ERROR_STOP` discipline gates runs —
into row-level, engine-native operators a warehouse pipeline would put in
front of every publish step.

Scale posture: both operators are ONE aggregation pass over the input.
`profile_columns` computes every column's stats in a single groupBy-less
agg (map-side combinable; no shuffle beyond the final single-partition
merge of one row of partials); `check_expectations` folds every declared
predicate into conditional counters in the same way. Neither collects
rows to the driver; the stacked-long output shape is built by a
`stack`-style union of one-row frames, which Catalyst collapses into the
single agg.
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
    names = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}

    def render(col: Column, dt: T.DataType) -> Column:
        # render AFTER aggregating (min/max must be computed in the native
        # type — a string min would be lexicographic)
        if isinstance(dt, _NUMERIC):
            return F.round(col.cast("double"), 4).cast("string")
        return col.cast("string")

    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for c in names:
        dt = by_name[c]
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(render(F.min(F.col(c)), dt).alias(f"{c}__min"))
        aggs.append(render(F.max(F.col(c)), dt).alias(f"{c}__max"))

    one = df.agg(*aggs)
    # pivot the single row of partials to long form: one output row per col
    stacked = [
        F.struct(
            F.lit(c).alias("col"),
            F.col("n").alias("n"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in names
    ]
    return one.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


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
