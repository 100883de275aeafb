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
