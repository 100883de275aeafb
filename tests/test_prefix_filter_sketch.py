"""Prefix-filtered Jaccard join and count-min-prefiltered heavy hitters:
both are EXACT scale paths — pinned here against their brute-force twins
on adversarial fixtures (the sf oracles cover the corpus tables)."""

from pyspark.sql import functions as F

from shared_etl_pipelines_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from shared_etl_pipelines_spark.operators.sketches import (
    count_min_heavy_hitters,
)


def _pairs(rows):
    return sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 4)) for r in rows)


def test_prefix_filter_matches_exhaustive(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.replace("delta", "lambda")
    far = "one two three four five six seven eight nine ten " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base + " extra tail tokens here")],
        ["doc_id", "text"],
    )
    for t in (0.3, 0.5, 0.8):
        exact = _pairs(ngram_jaccard_pairs(df, "doc_id", "text", threshold=t).collect())
        fast = _pairs(
            prefix_filter_jaccard_pairs(df, "doc_id", "text", threshold=t).collect()
        )
        assert fast == exact, f"threshold {t}"


def test_prefix_filter_boundary_jaccard(spark):
    # Two docs engineered to sit exactly AT the threshold: shared prefix
    # shingle is the rarest, so completeness can't ride on luck.
    a = "w1 w2 w3 w4 w5 w6"
    b = "w1 w2 w3 w4 zz yy"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    # distinct 3-shingles: a has 4, b has 4, intersection 2 -> J = 2/6 = 0.3333
    exact = _pairs(ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.33).collect())
    fast = _pairs(
        prefix_filter_jaccard_pairs(df, "doc_id", "text", threshold=0.33).collect()
    )
    assert fast == exact == [(1, 2, 0.3333)]


def test_prefix_filter_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "only two"), (3, "x y z"), (4, "x y z")], ["doc_id", "text"]
    )
    fast = _pairs(prefix_filter_jaccard_pairs(df, "doc_id", "text").collect())
    assert fast == [(3, 4, 1.0)]


def test_cms_heavy_hitters_exact(spark):
    rows = [(k,) for k in [1] * 50 + [2] * 30 + [3] * 5 + list(range(100, 400))]
    df = spark.createDataFrame(rows, ["k"])
    got = {
        (r["k"], r["n"])
        for r in count_min_heavy_hitters(df, "k", threshold=30).collect()
    }
    assert got == {(1, 50), (2, 30)}
    expected = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 30)
        .collect()
    }
    assert got == expected


def test_cms_heavy_hitters_no_hot_cells(spark):
    df = spark.createDataFrame([(k,) for k in range(200)], ["k"])
    assert count_min_heavy_hitters(df, "k", threshold=10).count() == 0


def test_cms_narrow_width_collisions_still_exact(spark):
    # width 2 forces every key into hot cells -> the sketch prunes
    # nothing, but the exact recount keeps the answer right.
    rows = [(k,) for k in [7] * 40 + list(range(8, 28))]
    df = spark.createDataFrame(rows, ["k"])
    got = {
        (r["k"], r["n"])
        for r in count_min_heavy_hitters(df, "k", threshold=20, width=2).collect()
    }
    assert got == {(7, 40)}


def test_cms_saturated_rows_skip_the_probe(spark):
    # r13 optimization: a sketch row whose hot set covers EVERY cell
    # cannot prune (its INSET probe is TRUE for all keys), so the probe
    # must be dropped from the plan — output already proven identical by
    # test_cms_narrow_width_collisions_still_exact. width=1 saturates
    # every row; the plan must carry no xxhash64 cell probes.
    rows = [(k,) for k in [7] * 40 + list(range(8, 28))]
    df = spark.createDataFrame(rows, ["k"])
    out = count_min_heavy_hitters(df, "k", threshold=20, width=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" not in plan
    assert {(r["k"], r["n"]) for r in out.collect()} == {(7, 40)}


def test_kmv_estimates_within_tolerance(spark):
    """KMV with k=128 over planted segments: 4000 distinct in A, 3000 in
    B, 1000 shared. Estimates must land within ~4/sqrt(k) (~35%) of
    truth — loose enough to be deterministic-safe, tight enough to catch
    a broken estimator (off by 2x+)."""
    from shared_etl_pipelines_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketches,
    )

    rows = [("A", i) for i in range(4000)] + [("B", i) for i in range(3000, 6000)]
    df = spark.createDataFrame(rows, "seg string, uid long")
    sk = kmv_sketches(df, "uid", "seg", k=128)
    est = {r["segment"]: r["est_distinct"] for r in kmv_estimate(sk, k=128).collect()}
    assert abs(est["A"] - 4000) / 4000 < 0.35
    assert abs(est["B"] - 3000) / 3000 < 0.35
    # sketch is deterministic: same input -> identical estimate
    est2 = {r["segment"]: r["est_distinct"] for r in kmv_estimate(sk, k=128).collect()}
    assert est == est2


def test_kmv_small_set_is_exact(spark):
    """A segment with fewer distinct keys than k holds the whole set:
    the estimate must be exactly the true distinct count."""
    from shared_etl_pipelines_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketches,
    )

    df = spark.createDataFrame([("S", i % 50) for i in range(500)], "seg string, uid long")
    sk = kmv_sketches(df, "uid", "seg", k=128)
    est = kmv_estimate(sk, k=128).collect()[0]
    assert est["est_distinct"] == 50.0
