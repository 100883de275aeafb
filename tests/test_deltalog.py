"""Delta transaction-log reader: checkpoint+tail must equal the full
JSON replay, time travel behind the checkpoint must fall back, and the
Spark-written checkpoint must be readable by the same reader."""

import json
import os

from pyspark.sql import functions as F

from shared_etl_pipelines_spark.sources import deltalog as D


def _mk_table(tmp_path):
    root = str(tmp_path / "tbl")
    D.write_commit(root, 0, [{"protocol": {"minReaderVersion": 1}}])
    D.write_commit(
        root,
        1,
        [
            {"add": {"path": "a.parquet", "size": 10,
                     "modificationTime": 1, "dataChange": True,
                     "partitionValues": {"day": "0"}}},
            {"add": {"path": "b.parquet", "size": 20,
                     "modificationTime": 2, "dataChange": True,
                     "partitionValues": {"day": "1"}}},
        ],
    )
    D.write_commit(
        root,
        2,
        [
            {"add": {"path": "c.parquet", "size": 30,
                     "modificationTime": 3, "dataChange": True,
                     "partitionValues": {"day": "2"}}},
            {"remove": {"path": "a.parquet", "deletionTimestamp": 4,
                        "dataChange": True}},
        ],
    )
    D.write_commit(
        root,
        3,
        [
            {"add": {"path": "d.parquet", "size": 40,
                     "modificationTime": 5, "dataChange": True,
                     "partitionValues": {"day": "3"}}},
        ],
    )
    return root


def _paths(df):
    return sorted(r["path"] for r in df.select("path").collect())


def test_snapshot_versions_and_tombstones(spark, tmp_path):
    root = _mk_table(tmp_path)
    assert _paths(D.snapshot_files(spark, root)) == [
        "b.parquet", "c.parquet", "d.parquet",
    ]
    assert _paths(D.snapshot_files(spark, root, version=1)) == [
        "a.parquet", "b.parquet",
    ]
    assert _paths(D.snapshot_files(spark, root, version=2)) == [
        "b.parquet", "c.parquet",
    ]
    snap = {
        r["path"]: r for r in D.snapshot_files(spark, root).collect()
    }
    assert snap["d.parquet"]["add_version"] == 3
    assert snap["b.parquet"]["partitionValues"]["day"] == "1"


def test_checkpoint_plus_tail_equals_full_replay(spark, tmp_path):
    root = _mk_table(tmp_path)
    D.write_checkpoint(spark, root, version=2)
    # reader now starts at the checkpoint: same live set as full replay
    with_cp = D.snapshot_files(spark, root)
    full = D._replay(spark, root, None, use_checkpoint=False).filter(
        F.col("kind") == "add"
    )
    assert _paths(with_cp) == _paths(full) == [
        "b.parquet", "c.parquet", "d.parquet",
    ]
    # the tombstone for a.parquet rode the checkpoint — a post-cp
    # commit re-adding it must win (last action per path)
    D.write_commit(
        root, 4,
        [{"add": {"path": "a.parquet", "size": 11, "modificationTime": 9,
                  "dataChange": True, "partitionValues": {"day": "0"}}}],
    )
    assert "a.parquet" in _paths(D.snapshot_files(spark, root))


def test_time_travel_behind_checkpoint_falls_back_to_replay(spark, tmp_path):
    root = _mk_table(tmp_path)
    D.write_checkpoint(spark, root, version=3)
    got = D.snapshot_files(spark, root, version=1)
    assert _paths(got) == ["a.parquet", "b.parquet"]
    # and versions are exact (a checkpoint would have flattened them)
    assert {r["add_version"] for r in got.collect()} == {1}


def test_log_history_counts_churn(spark, tmp_path):
    root = _mk_table(tmp_path)
    hist = {r["version"]: r for r in D.log_history(spark, root).collect()}
    assert hist[1]["n_adds"] == 2 and hist[1]["bytes_added"] == 30
    assert hist[2]["n_adds"] == 1 and hist[2]["n_removes"] == 1
    assert hist[3]["n_adds"] == 1 and 0 not in hist  # protocol-only commit


def test_demo_log_checkpoint_is_actually_used(spark, sf_dir):
    """The demo fixture's _last_checkpoint must point inside the log and
    the snapshot through it must equal a checkpoint-free replay — the
    oracle correctness of delta_snapshot_audit rides on this."""
    root = D.ensure_demo_delta_table(sf_dir)
    lc = os.path.join(root, "_delta_log", "_last_checkpoint")
    v = json.load(open(lc))["version"]
    assert os.path.exists(
        os.path.join(root, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    with_cp = _paths(D.snapshot_files(spark, root))
    without = _paths(
        D._replay(spark, root, None, use_checkpoint=False).filter(
            F.col("kind") == "add"
        )
    )
    assert with_cp == without and len(with_cp) > 0


def test_vacuum_plan_respects_retention(spark, tmp_path):
    root = _mk_table(tmp_path)  # a removed at ts 4 (commit 2)
    D.write_commit(
        root, 4,
        [{"remove": {"path": "c.parquet", "deletionTimestamp": 100,
                     "dataChange": True}}],
    )
    # horizon below the young tombstone: only the old one is deletable
    got = {r["path"]: r["deletion_ms"]
           for r in D.vacuum_plan(spark, root, before_ms=50).collect()}
    assert got == {"a.parquet": 4}
    # horizon past both: both tombstones deletable, live files never
    got2 = {r["path"] for r in D.vacuum_plan(spark, root, 10_000).collect()}
    assert got2 == {"a.parquet", "c.parquet"}
