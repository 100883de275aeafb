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
