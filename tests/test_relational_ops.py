"""Unit tests for as-of join (union-merge plan) and sessionization on
hand-checkable inputs."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.operators.joins import asof_join
from shared_etl_pipelines_spark.operators.windows import sessionize


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_basic_and_ties(spark):
    quotes = spark.createDataFrame(
        [
            (1, ts(9), 100, 10.0),
            (1, ts(11), 101, 11.0),
            (1, ts(11), 102, 99.0),  # same ts: max event_id (102) must win
            (2, ts(10), 103, 20.0),
        ],
        ["k", "t", "event_id", "px"],
    )
    trades = spark.createDataFrame(
        [
            (1, ts(10), "t1"),   # after 9:00 quote
            (1, ts(11), "t2"),   # ties with 11:00 quotes -> 99.0 (id 102)
            (1, ts(12), "t3"),   # still 99.0
            (2, ts(9), "t4"),    # before any quote -> dropped (inner)
            (3, ts(12), "t5"),   # key with no quotes -> dropped
        ],
        ["k", "t", "trade_id"],
    )
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on=["k"], left_ts="t", right_ts="t",
            value_cols=["px"], how="inner", right_tiebreak="event_id",
        ).collect()
    }
    assert out == {"t1": 10.0, "t2": 99.0, "t3": 99.0}


def test_asof_join_left_keeps_unmatched(spark):
    right = spark.createDataFrame([(1, ts(10), 1, 5.0)], ["k", "t", "event_id", "v"])
    left = spark.createDataFrame([(1, ts(9), "a"), (1, ts(11), "b")], ["k", "t", "id"])
    rows = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        value_cols=["v"], how="left",
    ).collect()
    got = {r["id"]: r["v"] for r in rows}
    assert got == {"a": None, "b": 5.0}


def test_sessionize_gap_splits(spark):
    rows = [
        (1, ts(9, 0), 1),
        (1, ts(9, 10), 2),   # 10 min gap -> same session
        (1, ts(10, 0), 3),   # 50 min gap -> new session
        (2, ts(9, 0), 4),    # other user -> own session numbering
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = sessionize(df, ["user_id"], "ts", gap_seconds=1800, tiebreak_col="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_scd2_merge_row_fates(spark):
    from shared_etl_pipelines_spark.operators.scd import scd2_merge

    dim = spark.createDataFrame(
        [
            # key 1: history row + open row that will change
            (1, "A", "2019-01-01", "2020-01-01"),
            (1, "B", "2020-01-01", None),
            # key 2: open row, unchanged in snapshot
            (2, "X", "2020-01-01", None),
            # key 3: open row, absent from snapshot -> stays open
            (3, "Y", "2020-01-01", None),
            # key 4: open NULL attr -> becomes value (NULL-safe change)
            (4, None, "2020-01-01", None),
        ],
        "k long, seg string, valid_from string, valid_to string",
    ).select(
        "k", "seg",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    snap = spark.createDataFrame(
        [(1, "C"), (2, "X"), (4, "Z"), (5, "NEW")], "k long, seg string"
    )
    out = scd2_merge(dim, snap, ["k"], ["seg"], snap_date="2024-06-01")
    rows = {
        (r["k"], r["seg"], str(r["valid_from"]), str(r["valid_to"]))
        for r in out.collect()
    }
    assert rows == {
        (1, "A", "2019-01-01", "2020-01-01"),  # history untouched
        (1, "B", "2020-01-01", "2024-06-01"),  # closed
        (1, "C", "2024-06-01", "None"),        # new version
        (2, "X", "2020-01-01", "None"),        # unchanged stays open
        (3, "Y", "2020-01-01", "None"),        # absent from snap stays open
        (4, None, "2020-01-01", "2024-06-01"), # NULL->Z is a change
        (4, "Z", "2024-06-01", "None"),
        (5, "NEW", "2024-06-01", "None"),      # brand-new key
    }


def test_global_rank_and_ntile_match_builtin_windows(spark, sf_dir):
    from pyspark.sql import Window

    from shared_etl_pipelines_spark.operators.windows import (
        global_ntile,
        global_row_number,
    )
    from shared_etl_pipelines_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    order = ["o_totalprice", "o_orderkey"]
    got = global_row_number(o, order)
    ref = o.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.subtract(ref).count() == 0 and ref.subtract(got).count() == 0

    gt = global_ntile(o, order, 7, out_col="b")
    rt = o.withColumn("b", F.ntile(7).over(Window.orderBy(*order)))
    assert gt.subtract(rt).count() == 0 and rt.subtract(gt).count() == 0


def test_snapshot_diff_classifies_all_three(spark):
    from shared_etl_pipelines_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 deleted, 2 unchanged (absent), 3 updated, 4 inserted
    assert got == {1: "delete", 3: "update", 4: "insert"}
