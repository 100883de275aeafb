"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is never trained on wholesale — pipelines carve
stratified, reproducible subsets (per-language / per-source quotas).
`df.sample()` is seed-dependent ACROSS partitionings (Spark samples per
partition), so a repartition changes the sample; these operators instead
hash stable row keys, making the subset a pure function of the data:
re-runs, retries, and cluster-layout changes all select identical rows,
and the selection predicate pushes down like any other filter (no
shuffle, no state).

Hash: Knuth multiplicative over the key (portable integer arithmetic —
bit-identical in Spark and the DuckDB oracle). At real scale swap
`_uniform` for xxhash64/md5 on a string key; the contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's 2^32 golden-ratio multiplier; key < 2^31 keeps the product in
# int64 range in every engine.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def uniform_hash(key: Column) -> Column:
    """Deterministic uniform [0,1) from an integer key column."""
    return ((key.cast("long") * F.lit(_KNUTH)) % F.lit(_MOD)) / F.lit(float(_MOD))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff uniform_hash(key) < rate(stratum).

    ``rates`` maps stratum value -> keep probability; unlisted strata use
    ``default_rate``. Output adds the ``sample_u`` column (the row's
    uniform draw) so downstream stages can sub-sample consistently —
    nested subsets: u < 0.1 is contained in u < 0.5.
    """
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.withColumn("sample_u", uniform_hash(F.col(key_col))).filter(
        F.col("sample_u") < rate
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    k: int,
    strata_cols: list[str] | None = None,
    key_out: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u = uniform_hash(key) and ranks by
    u^(1/w); the top-k per stratum is a weighted sample without
    replacement with inclusion probability proportional to weight.

    Distributed shape: the rank is one window per stratum (a top-k heap
    per group under AQE); nothing global, nothing iterative. Determinism:
    u is the same Knuth hash as `stratified_sample`, so the sample is a
    pure function of the data — layout, retries, and cluster shape can't
    change it.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = uniform_hash(F.col(key_col))
    keyed = df.withColumn(key_out, F.pow(u, 1.0 / w.cast("double")))
    from pyspark.sql import Window

    parts = strata_cols or []
    win = (
        Window.partitionBy(*parts).orderBy(
            F.col(key_out).desc(), F.col(key_col)
        )
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
    )
