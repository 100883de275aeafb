"""range_join vs the naive theta join; hypertable cascade vs direct
per-resolution aggregation from raw rows."""

import random

import pytest
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.operators.hypertable import hypertable_rollup
from shared_etl_pipelines_spark.operators.joins import range_join


@pytest.mark.parametrize("bucket_width", [1, 3, 7, 100])
def test_range_join_matches_theta_join(spark, bucket_width):
    rng = random.Random(7)
    points = [(i, rng.randrange(0, 200)) for i in range(300)]
    # overlapping intervals, varied spans incl. width < and > bucket_width
    intervals = [
        (j, s, s + rng.randrange(1, 40))
        for j, s in ((j, rng.randrange(0, 200)) for j in range(40))
    ]
    p = spark.createDataFrame(points, ["pid", "p"])
    iv = spark.createDataFrame(intervals, ["iid", "s", "e"])
    got = {
        (r["pid"], r["iid"])
        for r in range_join(p, iv, "p", "s", "e", bucket_width=bucket_width).collect()
    }
    want = {
        (pid, iid)
        for pid, pv in points
        for iid, s, e in intervals
        if s <= pv < e
    }
    assert got == want and len(want) > 100


def test_range_join_empty_and_exclusive_end(spark):
    p = spark.createDataFrame([(1, 10), (2, 20)], ["pid", "p"])
    iv = spark.createDataFrame([(1, 10, 20)], ["iid", "s", "e"])
    rows = range_join(p, iv, "p", "s", "e", bucket_width=5).collect()
    # 10 is included (>= start), 20 excluded (< end)
    assert [(r["pid"], r["iid"]) for r in rows] == [(1, 1)]


def test_hypertable_cascade_equals_direct(spark):
    rng = random.Random(11)
    rows = [
        (i, f"2024-0{rng.randrange(1, 3)}-{rng.randrange(1, 28):02d} "
            f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:00",
         round(rng.uniform(-5, 50), 2))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["i", "ts_s", "value"]).select(
        "i", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    got = hypertable_rollup(df, "ts", "value", ("hour", "day", "month"))
    for res in ("hour", "day", "month"):
        direct = (
            df.groupBy(F.date_format(F.date_trunc(res, "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )
        want = {
            r["bucket"]: (r["n"], round(r["sum_value"], 6), r["min_value"], r["max_value"])
            for r in direct.collect()
        }
        got_res = {
            r["bucket"]: (r["n"], round(r["sum_value"], 6), r["min_value"], r["max_value"])
            for r in got.filter(F.col("resolution") == res).collect()
        }
        assert got_res == want
        # avg consistency
        for r in got.filter(F.col("resolution") == res).collect():
            assert r["avg_value"] == pytest.approx(r["sum_value"] / r["n"], rel=1e-9)


def test_hypertable_rejects_unknown_resolution(spark):
    df = spark.range(1).select(F.current_timestamp().alias("ts"), F.lit(1.0).alias("v"))
    with pytest.raises(ValueError):
        hypertable_rollup(df, "ts", "v", ("hour", "decade"))


def test_gap_fill_locf_semantics(spark):
    from shared_etl_pipelines_spark.operators.hypertable import gap_fill_locf

    df = spark.createDataFrame(
        [(1, "2024-01-02", 10), (1, "2024-01-05", 20), (2, "2024-01-03", 7)],
        "k long, day string, v long",
    ).select("k", F.col("day").cast("date").alias("day"), "v")
    out = gap_fill_locf(df, "k", "day", "v", "2024-01-01", "2024-01-06")
    rows = {(r["k"], str(r["day"])): (r["v_locf"], r["was_gap"]) for r in out.collect()}
    assert len(rows) == 12  # 2 keys x 6 days
    assert rows[(1, "2024-01-01")] == (None, 1)  # before first obs: no fabrication
    assert rows[(1, "2024-01-02")] == (10, 0)
    assert rows[(1, "2024-01-03")] == (10, 1)  # carried forward
    assert rows[(1, "2024-01-04")] == (10, 1)
    assert rows[(1, "2024-01-05")] == (20, 0)
    assert rows[(1, "2024-01-06")] == (20, 1)
    assert rows[(2, "2024-01-06")] == (7, 1)


def test_holt_smooth_typed_order_columns(spark):
    """ADVICE r7 #2: holt_linear_smooth must accept non-string order
    columns. Typed sort order must hold (int 10 after 2, not string
    order), the fold must analyze (the accumulator used to hardcode
    o:string), and the output order column keeps the input type."""
    from shared_etl_pipelines_spark.operators.hypertable import holt_linear_smooth

    vals = [1.0, 3.0, 2.0, 6.0, 4.0, 8.0, 5.0, 9.0, 7.0, 10.0, 11.0, 12.0]

    def expected(ys):
        lev, tr, out = ys[0], 0.0, []
        for y in ys[1:]:
            fit = lev + tr
            lev2 = 0.5 * y + 0.5 * (lev + tr)
            tr = 0.5 * (lev2 - lev) + 0.5 * tr
            lev = lev2
            out.append((y, fit, lev, tr))
        return out

    want = expected(vals)

    # int order column spanning 1..12 (string sort would put 10 < 2)
    df_int = spark.createDataFrame(
        [(1, i + 1, v) for i, v in enumerate(vals)], "k long, t int, v double"
    )
    out_int = holt_linear_smooth(df_int, ["k"], "t", "v")
    assert dict(out_int.dtypes)["t"] == "int"
    rows = sorted(out_int.collect(), key=lambda r: r["t"])
    assert [r["t"] for r in rows] == list(range(2, 13))
    for r, (y, fit, lev, tr) in zip(rows, want):
        assert r["y"] == pytest.approx(y)
        assert r["fitted"] == pytest.approx(fit)
        assert r["level"] == pytest.approx(lev)
        assert r["trend"] == pytest.approx(tr)

    # date order column: analyzes, keeps the date type, same numbers
    df_date = spark.createDataFrame(
        [(1, f"2024-01-{i + 1:02d}", v) for i, v in enumerate(vals)],
        "k long, day string, v double",
    ).select("k", F.col("day").cast("date").alias("day"), "v")
    out_date = holt_linear_smooth(df_date, ["k"], "day", "v")
    assert dict(out_date.dtypes)["day"] == "date"
    rows_d = sorted(out_date.collect(), key=lambda r: r["day"])
    assert [r["fitted"] for r in rows_d] == pytest.approx([w[1] for w in want])
