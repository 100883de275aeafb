"""Skew-mitigation operators: salted plans must equal their direct forms."""

import pytest
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_direct(spark):
    # hot key: 'h' holds 90% of rows
    rows = [("h", float(i)) for i in range(90)] + [("c", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r
        for r in salted_aggregate(
            df, ["k"],
            {"total": ("sum", "v"), "n": ("count", "v"),
             "mean": ("avg", "v"), "mx": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"),
             F.avg("v").alias("mean"), F.max("v").alias("mx"))
        .collect()
    }
    for k in want:
        for c in ("total", "n", "mx"):
            assert got[k][c] == want[k][c]
        assert got[k]["mean"] == pytest.approx(want[k]["mean"])


def test_salted_aggregate_rejects_non_algebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_aggregate(df, ["k"], {"m": ("median", "v")})


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(300)], ["k", "row_id", "v"]
    )
    med = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "tag"])
    got = sorted(
        (r["row_id"], r["tag"])
        for r in salted_join(big, med, on=["k"], n_salts=4).collect()
    )
    want = sorted(
        (r["row_id"], r["tag"]) for r in big.join(med, on="k").collect()
    )
    assert got == want


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew mitigation must actually engage under the
    engine's configs: a join where one key holds ~all the rows should show
    a skew-handled SortMergeJoin in the final adaptive plan."""
    left = spark.range(200_000).selectExpr(
        # 95% of rows on key 0, the rest spread thin
        "CASE WHEN id % 20 != 0 THEN 0 ELSE id END AS k", "id AS payload"
    )
    right = spark.range(50_000).selectExpr("id AS k", "id * 2 AS r_payload")
    old = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        # thresholds scaled down so the tiny test dataset still counts as
        # skewed; the mechanism (not the default sizing) is under test
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        joined = left.join(right, "k")
        # execute THIS DataFrame's plan (count() would run a different
        # query execution and leave this one un-finalized)
        n = len(joined.collect())
        # 190k rows on k=0 (matches the one right row) + multiples of 20
        # below 50k (2,500) on the long tail
        assert n == 192_500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for key, val in old.items():
            spark.conf.set(key, val)


# ---------------------------------------------------------------------
# VERDICT r9 task #6: skew gates for the two heaviest shuffle paths —
# the embedding_dbscan edge build (SRP bucket self-join) and the
# near_dup_prefix_filter token inversion.
# ---------------------------------------------------------------------


def test_engine_session_pins_aqe_skew_join(spark):
    """The engine factory must keep AQE + skew-join splitting on — the
    runtime backstop for every shuffle join the explicit guards don't
    cover (the config the dbscan/prefix-filter scale stories assume)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def _unit_vec(seed: int, dim: int = 64) -> list[float]:
    import random

    rng = random.Random(seed)
    v = [rng.uniform(-1, 1) for _ in range(dim)]
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v]


def test_embedding_lsh_hot_bucket_cap_bounds_candidates(spark):
    """Planted skew: 30% of vectors share ONE direction, so every SRP
    table puts them in the same bucket and the candidate self-join goes
    quadratic in that bucket (the 100 TB template-cluster shape). The
    occupancy guard must drop the degenerate bucket BEFORE pair
    generation: no hot-hot pair survives, the long tail is untouched,
    and the capped output is a subset of the uncapped one."""
    from shared_etl_pipelines_spark.operators.similarity import (
        embedding_near_dup_lsh,
    )

    n, dim = 200, 64
    hot_ids = set(range(60))  # 30%
    hot = _unit_vec(7, dim)
    rows = [
        (i, hot if i in hot_ids else _unit_vec(1000 + i, dim))
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(emb, tau=0.9).collect()
    }
    hot_pairs = {
        p for p in uncapped if p[0] in hot_ids and p[1] in hot_ids
    }
    # the planted cluster really is quadratic without the guard
    assert len(hot_pairs) == 60 * 59 // 2

    capped = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(
            emb, tau=0.9, max_bucket_size=32
        ).collect()
    }
    assert not any(p[0] in hot_ids and p[1] in hot_ids for p in capped)
    assert capped <= uncapped
    # and the guard is loud-by-design, not lossy on normal data: a
    # corpus with no over-cap bucket is byte-identical
    tail = spark.createDataFrame(
        rows[60:], "vec_id long, embedding array<float>"
    )
    assert {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(tail, tau=0.9).collect()
    } == {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(
            tail, tau=0.9, max_bucket_size=32
        ).collect()
    }


def test_prefix_filter_rarest_first_defuses_hot_shingle(spark):
    """Planted skew: one shingle appears in 30% of docs. Rarest-first
    prefix selection must keep it out of every prefix (its rank lands
    past the cutoff sz - ceil(t*sz) + 1), so the token-inversion join
    never fans out on the hot key — and the pair output still equals
    the O(n^2) brute force on the same corpus."""
    import itertools

    from shared_etl_pipelines_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    n_docs, sz, t = 120, 12, 0.5
    hot = "zz qq xx"  # one 3-gram = 3 shared tokens mid-doc
    docs = []
    for d in range(n_docs):
        toks = [f"w{d}_{j}" for j in range(sz)]
        if d % 10 < 3:  # 30% carry the hot run
            toks[4:7] = ["zz", "qq", "xx"]
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=t
        ).collect()
    }

    # brute force over 3-gram shingle sets
    def sh(text):
        ts = text.split()
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    sets = {d: sh(text) for d, text in docs}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union
        if j >= t:
            want.add((a, b, round(j, 6)))
    assert got == want  # skew never corrupts the output
    # hot shingles share at most 3 of ~10 shingles -> jaccard << t:
    # the planted skew produces NO true pairs, so any quadratic blowup
    # would have been pure wasted candidates
    assert want == set()

    # the defusal property itself: every hot shingle ranks past the
    # prefix cutoff in every doc (freq asc, shingle asc — the
    # operator's declared canonical order)
    from collections import Counter

    freq = Counter(s for ss in sets.values() for s in ss)
    for d, ss in sets.items():
        if not any(h in ss for h in ("zz qq xx",)):
            continue
        order = sorted(ss, key=lambda s: (freq[s], s))
        cutoff = len(ss) - int(-(-t * len(ss) // 1)) + 1  # sz - ceil(t*sz) + 1
        prefix = set(order[:cutoff])
        for s in ss:
            if freq[s] > 1:  # the hot shingles
                assert s not in prefix, (d, s)
