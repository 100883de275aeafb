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


def _pct_frac(name: str) -> float | None:
    if name in _PCT:
        return _PCT[name]
    if name.startswith("p") and name[1:].replace(".", "", 1).isdigit():
        return float(name[1:]) / 100.0
    return None


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
        frac = _pct_frac(name)
        if frac is not None:
            c = F.percentile_approx(v, frac) if approx else F.percentile(v, frac)
        elif name in _SIMPLE:
            c = _SIMPLE[name](v)
        else:
            raise ValueError(f"unknown aggregation: {name!r}")
        cols.append(c.alias(alias))
    return cols


def agg_plan(
    value_col: str,
    aggregations: str | list[str],
    value_prefix: str = "",
    approx: bool = False,
) -> tuple[list[Column], list[Column]]:
    """Single-pass form of :func:`agg_exprs`: all percentile fractions share
    ONE ``percentile(v, array(...))`` aggregate (one sort buffer per group
    instead of one per fraction), unpacked afterwards by a projection.

    Returns ``(agg_cols, post_cols)``: apply ``agg(*agg_cols)`` then
    ``select(*group_cols, *post_cols)``.
    """
    names = parse_agg_list(aggregations)
    fracs = [f for f in (_pct_frac(n) for n in names) if f is not None]
    v = F.col(value_col)
    pct_alias = f"_pcts_{value_col}"
    aggs: list[Column] = []
    if fracs:
        pfn = F.percentile_approx if approx else F.percentile
        aggs.append(pfn(v, F.array(*[F.lit(f) for f in fracs])).alias(pct_alias))
    post: list[Column] = []
    pct_i = 0
    for name in names:
        alias = f"{value_prefix}_{name}" if value_prefix else name
        if _pct_frac(name) is not None:
            pct_i += 1  # element_at is 1-indexed
            post.append(F.element_at(F.col(pct_alias), pct_i).alias(alias))
        elif name in _SIMPLE:
            aggs.append(_SIMPLE[name](v).alias(alias))
            post.append(F.col(alias))
        else:
            raise ValueError(f"unknown aggregation: {name!r}")
    return aggs, post


def zonal_aggregate(
    cells: DataFrame,
    zone_cols: list[str],
    value_col: str,
    aggregations: str | list[str] = "min,p5,q1,med,avg,q3,p95,max",
    value_prefix: str = "",
    approx: bool = False,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Zonal statistics = GROUP BY zone + declared multi-aggregate list.

    Reference: geo_county_raster_aggregate.py invocation,
    pipelines/prism/county_daily_aggregate.yml:24-36 (agg list line 15).
    Scale note: one shuffle on the zone key with map-side partial
    aggregation for the algebraic aggs; all percentiles share a single
    sort buffer per group (agg_plan) — use approx=True at cluster scale
    to replace the sort with a mergeable sketch.
    """
    aggs, post = agg_plan(value_col, aggregations, value_prefix, approx)
    extra = {k: c.alias(k) for k, c in (extra_aggs or {}).items()}
    out = cells.groupBy(*zone_cols).agg(*aggs, *extra.values())
    return out.select(*zone_cols, *post, *extra)


def ranked_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    aggregations: str | list[str] = "min,p5,q1,med,avg,q3,p95,max",
    value_prefix: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT quantiles with fully distributed sorting — the 100 TB exact
    path.

    ``percentile()`` buffers every value of a group inside ONE task, so a
    group bigger than executor memory breaks it and per-group parallelism
    is 1. This formulation never builds a group-sized buffer:

    1. range-repartition by (group, value) — each task holds a sorted-
       range slice of each group, bounded by partition size;
    2. per-(slice, group) row counts -> prefix-sum window over the TINY
       counts frame (partitions x groups rows) gives each slice's global
       rank offset — no driver collect anywhere;
    3. row_number within the slice + offset = exact global rank; only
       rows landing on a quantile's bracketing ranks survive the filter
       (<= 2 x quantiles x groups rows);
    4. final per-group projection interpolates v_lo + frac * (v_hi-v_lo)
       — the same expression DuckDB's quantile_cont and Spark's
       percentile evaluate, so results hash-match the oracle exactly.

    Simple aggregates in the declared list (min/max/avg/sum/count) ride
    the counts pass as mergeable partials — no extra scan. Two passes
    over the data total; parallelism = partitions x groups throughout.
    """
    names = parse_agg_list(aggregations)
    # "<pct>_disc" = discrete percentile: the value at rank ceil(q*n) (no
    # interpolation) — DuckDB quantile_disc semantics
    disc = {n: _pct_frac(n[: -len("_disc")]) for n in names if n.endswith("_disc")}
    fracs = {n: (None if n in disc else _pct_frac(n)) for n in names}
    unsupported = [
        n for n in names
        if fracs[n] is None
        and disc.get(n) is None
        and n not in ("min", "max", "avg", "mean", "sum", "count")
    ]
    if unsupported:
        raise ValueError(f"ranked_quantiles cannot compute: {unsupported}")

    from pyspark.sql import Window

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    v = F.col(value_col)
    base = df.select(*group_cols, value_col).filter(v.isNotNull())
    ranged = base.repartitionByRange(p, *group_cols, value_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    # spark_partition_id() is non-deterministic to Catalyst, so the range-
    # shuffle subtree under the offsets/totals broadcasts and under the
    # main ranked pass NEVER canonicalizes equal — measured: zero
    # ReusedExchange, FOUR source scans in the executed plan. Persist +
    # eager-materialize so the sampling pass + range shuffle run exactly
    # once (racing broadcast builds would otherwise each compute the
    # unmaterialized cache). Lazy-operator persist discipline as in
    # minhash_lsh_pairs: callers reclaim via StorageScope / the session
    # sweep.
    ranged = ranged.persist()
    ranged.count()

    # counts pass — also carries the mergeable simple-agg partials
    slice_stats = ranged.groupBy("_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
        F.sum(v).alias("_sum"),
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = slice_stats.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_offset"),
    )
    totals = slice_stats.groupBy(*group_cols).agg(
        F.sum("_c").alias("_n"),
        F.min("_min").alias("_gmin"),
        F.max("_max").alias("_gmax"),
        F.sum("_sum").alias("_gsum"),
    )

    if not any(f is not None for f in fracs.values()) and not disc:
        # no quantiles requested: totals already hold everything
        per_group = totals.select(*group_cols)
        out = per_group.join(F.broadcast(totals), group_cols)
        return _ranked_post(out, names, fracs, {}, group_cols, value_prefix)

    w_rank = Window.partitionBy("_pid", *group_cols).orderBy(value_col)
    ranked = (
        ranged.withColumn("_rn", F.row_number().over(w_rank))
        .join(F.broadcast(offsets), ["_pid", *group_cols])
        .join(F.broadcast(totals.select(*group_cols, "_n")), group_cols)
        .withColumn("_rank", F.col("_offset") + F.col("_rn"))
    )

    # keep only rows bracketing some requested quantile
    keep = F.lit(False)
    n1 = (F.col("_n") - 1).cast("double")
    for frac in {f for f in fracs.values() if f is not None}:
        h = n1 * F.lit(frac)
        keep = keep | (F.col("_rank") == F.floor(h) + 1) | (
            F.col("_rank") == F.ceil(h) + 1
        )
    for frac in set(disc.values()):
        dr = F.greatest(F.lit(1), F.ceil(F.col("_n").cast("double") * F.lit(frac)))
        keep = keep | (F.col("_rank") == dr)
    hits = ranked.filter(keep)

    q_aggs: list[Column] = []  # _n arrives via the totals join
    for name, frac in fracs.items():
        if frac is None:
            continue
        h = n1 * F.lit(frac)
        q_aggs.append(
            F.max(F.when(F.col("_rank") == F.floor(h) + 1, v)).alias(f"_lo_{name}")
        )
        q_aggs.append(
            F.max(F.when(F.col("_rank") == F.ceil(h) + 1, v)).alias(f"_hi_{name}")
        )
    for name, frac in disc.items():
        dr = F.greatest(F.lit(1), F.ceil(F.col("_n").cast("double") * F.lit(frac)))
        q_aggs.append(F.max(F.when(F.col("_rank") == dr, v)).alias(f"_d_{name}"))
    per_group = hits.groupBy(*group_cols).agg(*q_aggs)
    out = per_group.join(F.broadcast(totals), group_cols)
    return _ranked_post(out, names, fracs, disc, group_cols, value_prefix)


def _ranked_post(
    out: DataFrame,
    names: list[str],
    fracs: dict[str, float | None],
    disc: dict[str, float],
    group_cols: list[str],
    value_prefix: str,
) -> DataFrame:
    post: list[Column] = []
    for name in names:
        alias = f"{value_prefix}_{name}" if value_prefix else name
        if name in disc:
            post.append(F.col(f"_d_{name}").alias(alias))
            continue
        frac = fracs[name]
        if frac is not None:
            h = (F.col("_n") - 1).cast("double") * F.lit(frac)
            fr = h - F.floor(h)
            lo, hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
            # DuckDB quantile_cont / Spark percentile interpolation form
            post.append((lo + fr * (hi - lo)).alias(alias))
        elif name in ("min",):
            post.append(F.col("_gmin").alias(alias))
        elif name in ("max",):
            post.append(F.col("_gmax").alias(alias))
        elif name in ("avg", "mean"):
            post.append((F.col("_gsum") / F.col("_n")).alias(alias))
        elif name == "sum":
            post.append(F.col("_gsum").alias(alias))
        elif name == "count":
            post.append(F.col("_n").alias(alias))
    return out.select(*group_cols, *post)


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


def exact_rank_values(
    df: DataFrame, col: str, ranks: list[int], num_partitions: int = 64
) -> dict[int, float]:
    """Exact k-th smallest values (1-based ``ranks``) of a large
    column WITHOUT a global sort or a single-task percentile buffer.

    Spark's exact ``percentile`` aggregate merges every value into one
    final task (9.7 s for 2.9M doubles, measured round 8); selection
    only needs: (1) range-repartition by value — equal values land in
    one partition, partition ids are value-ordered — (2) O(partitions)
    per-partition counts to the driver, (3) collect + sort ONLY the
    partitions holding the requested ranks (~n/partitions values).
    Driver traffic is O(partitions + n/partitions); every heavy step
    is a narrow distributed pass. The multiset's k-th smallest is
    well-defined whatever the partition boundaries, so the (sampled)
    range split affects cost, never the answer.
    """
    # NULLs (e.g. minted by the cast) would silently shift every rank
    # and crash the local sort — ranks are defined over the NON-NULL
    # multiset (review r8 #10)
    s = (
        df.select(F.col(col).cast("double").alias("x"))
        .filter(F.col("x").isNotNull())
        .repartitionByRange(num_partitions, "x")
        .persist()
    )
    try:
        pc = (
            s.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        parts = sorted((r["pid"], r["c"]) for r in pc)
        out: dict[int, float] = {}
        need = sorted(set(ranks))
        cum = 0
        for pid, c in parts:
            local = [k for k in need if cum < k <= cum + c]
            if local:
                vals = sorted(
                    r["x"]
                    for r in s.withColumn("pid", F.spark_partition_id())
                    .filter(F.col("pid") == pid)
                    .select("x")
                    .collect()
                )
                for k in local:
                    out[k] = vals[k - cum - 1]
            cum += c
        missing = [k for k in need if k not in out]
        if missing:
            raise ValueError(f"ranks {missing} exceed row count {cum}")
        return out
    finally:
        s.unpersist()


def distributed_exact_median(df: DataFrame, col: str, n: int | None = None) -> float:
    """Exact interpolated median via :func:`exact_rank_values`,
    computed with the SQL ``quantile_cont`` association
    ``lo + (hi - lo) * 0.5`` so the double matches an oracle replay
    bit-for-bit. ``n`` (if given) must be the NON-NULL count — the
    default recomputes it with the same null filter the selection
    applies."""
    if n is None:
        n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        raise ValueError("median of an empty frame")
    k1, k2 = (n + 1) // 2, n // 2 + 1
    got = exact_rank_values(df, col, [k1, k2])
    lo, hi = got[k1], got[k2]
    return lo + (hi - lo) * 0.5
