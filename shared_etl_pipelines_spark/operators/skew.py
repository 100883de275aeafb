"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join splitting (enabled in engine.py) handles most runtime
skew; these explicit forms are for the cases AQE cannot rewrite — a
groupBy where one key holds a large share of all rows (the classic
hot-key aggregate), and a shuffle join against a side too big to
broadcast with a handful of pathological keys.

Pattern (SURVEY.md scale notes): spread the hot key over ``n_salts``
sub-keys, partially aggregate, then combine. Both phases are map-side
combinable, so the first shuffle carries n_salts rows per hot key
instead of every raw row landing on one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial-phase expression, final-phase expression (over the partial alias)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregate: ``aggs`` maps out_col -> (fn, col) with
    fn in {sum,count,min,max,avg}. avg decomposes into sum+count so every
    partial is algebraic/mergeable.

    ``salt_source`` (a column expression) makes the salt deterministic
    (hash % n); default is a per-row monotonic id, which spreads rows
    uniformly regardless of value distribution.
    """
    if salt_source is None:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.hash(src), F.lit(n_salts))
    salted = df.withColumn("_salt", salt)

    partials: list[Column] = []
    finals: list[Column] = []
    for out, (fn, col) in aggs.items():
        fn = fn.lower()
        if fn == "avg":
            partials.append(F.sum(col).alias(f"_s_{out}"))
            partials.append(F.count(col).alias(f"_c_{out}"))
            finals.append(
                (F.sum(f"_s_{out}") / F.sum(f"_c_{out}")).alias(out)
            )
        elif fn in _ALGEBRAIC:
            part, comb = _ALGEBRAIC[fn]
            partials.append(part(F.col(col)).alias(f"_p_{out}"))
            finals.append(comb(F.col(f"_p_{out}")).alias(out))
        else:
            raise ValueError(f"non-algebraic agg not saltable: {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    medium: DataFrame,
    on: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant shuffle join: the big side salts each row
    deterministically; the medium side replicates n_salts times so every
    (key, salt) bucket finds its match. Use when the medium side exceeds
    the broadcast threshold AND the big side has hot keys; costs
    n_salts x |medium| shuffle volume in exchange for even reducers.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    med_s = medium.select("*", salts)
    return big_s.join(med_s, on=[*on, "_salt"], how="inner").drop("_salt")
