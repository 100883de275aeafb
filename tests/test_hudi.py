"""Hudi timeline reader: instant parsing, state/action filtering, and
copy-on-write latest-slice resolution."""

import pytest

from shared_etl_pipelines_spark.sources import hudi as H


def _mk(tmp_path):
    root = str(tmp_path / "tbl")
    t1, t2 = "20240101000000001", "20240101000000002"
    H.write_commit_instant(
        root, t1,
        {"day=0": [
            {"fileId": "f-a", "path": f"day=0/f-a_0_{t1}.parquet",
             "numWrites": 10, "numUpdateWrites": 0, "totalWriteBytes": 80},
            {"fileId": "f-b", "path": f"day=0/f-b_0_{t1}.parquet",
             "numWrites": 20, "numUpdateWrites": 0, "totalWriteBytes": 160},
        ]},
    )
    H.write_commit_instant(
        root, t2,
        {"day=0": [
            {"fileId": "f-a", "path": f"day=0/f-a_0_{t2}.parquet",
             "numWrites": 10, "numUpdateWrites": 10, "totalWriteBytes": 90},
        ]},
    )
    H.write_commit_instant(root, "20240101000000003", {}, action="clean")
    H.write_commit_instant(root, "20240101000000004", {}, state="inflight")
    return root


def test_latest_slice_wins_and_inflight_skipped(spark, tmp_path):
    root = _mk(tmp_path)
    got = {r["file_id"]: r for r in H.snapshot_file_slices(spark, root).collect()}
    assert set(got) == {"f-a", "f-b"}
    assert got["f-a"]["total_write_bytes"] == 90  # the replacing slice
    assert got["f-a"]["n_slices"] == 2
    assert got["f-b"]["total_write_bytes"] == 160
    assert got["f-b"]["n_slices"] == 1


def test_timeline_census_and_refusals(spark, tmp_path):
    root = _mk(tmp_path)
    inst = H.timeline_instants(root)
    assert [(i["action"], i["state"]) for i in inst] == [
        ("commit", "completed"), ("commit", "completed"),
        ("clean", "completed"), ("commit", "inflight"),
    ]
    import os

    open(os.path.join(root, ".hoodie", "garbage.txt"), "w").write("x")
    with pytest.raises(ValueError, match="unrecognized timeline file"):
        H.timeline_instants(root)
    os.remove(os.path.join(root, ".hoodie", "garbage.txt"))
    with pytest.raises(ValueError, match="no .hoodie"):
        H.timeline_instants(str(tmp_path / "nope"))


def test_empty_timeline_refuses(spark, tmp_path):
    root = str(tmp_path / "t2")
    H.write_commit_instant(root, "20240101000000009", {}, state="requested")
    with pytest.raises(ValueError, match="no completed commits"):
        H.snapshot_file_slices(spark, root)
