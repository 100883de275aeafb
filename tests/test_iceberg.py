"""Iceberg snapshot reader: metadata/manifest-list/manifest walk,
status filtering, time travel, and refusals."""

import json
import os

import pytest

from shared_etl_pipelines_spark.sources import iceberg as I


def test_demo_table_layout_and_codecs(spark, sf_dir):
    root = I.ensure_demo_iceberg_table(sf_dir)
    meta = I.read_table_metadata(root)
    assert meta["current-snapshot-id"] == 200
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [100, 200]
    # odd buckets' manifests really use deflate (both codecs exercised)
    from shared_etl_pipelines_spark.sources.avro import read_avro_ocf

    m0 = read_avro_ocf(open(os.path.join(root, "manifests", "m-200-00000.avro"), "rb").read())
    m1 = read_avro_ocf(open(os.path.join(root, "manifests", "m-200-00001.avro"), "rb").read())
    assert (m0["codec"], m1["codec"]) == ("null", "deflate")


def test_snapshot_files_filters_deleted(spark, sf_dir):
    root = I.ensure_demo_iceberg_table(sf_dir)
    live = I.snapshot_files(spark, root)
    ids = sorted(
        int(r["file_path"].split("part-")[1].split(".")[0])
        for r in live.collect()
    )
    assert ids and all(d % 9 != 8 for d in ids)
    old = I.snapshot_files(spark, root, snapshot_id=100)
    old_ids = {  # pre-churn snapshot still carries the churn docs
        int(r["file_path"].split("part-")[1].split(".")[0])
        for r in old.collect()
    }
    assert any(d % 9 == 8 for d in old_ids)
    assert set(ids) <= old_ids


def test_unknown_snapshot_refuses(spark, sf_dir):
    root = I.ensure_demo_iceberg_table(sf_dir)
    with pytest.raises(ValueError, match="snapshot 999"):
        I.snapshot_files(spark, root, snapshot_id=999)


def test_newest_metadata_version_wins(tmp_path, spark, sf_dir):
    root = I.ensure_demo_iceberg_table(sf_dir)
    import shutil

    t = str(tmp_path / "tbl")
    shutil.copytree(root, t)
    meta = json.load(open(os.path.join(t, "metadata", "v1.metadata.json")))
    meta["current-snapshot-id"] = 100  # v2 flips the current snapshot
    with open(os.path.join(t, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    got = I.read_table_metadata(t)
    assert got["current-snapshot-id"] == 100


def test_expire_plan_is_the_reachability_diff(spark, sf_dir):
    root = I.ensure_demo_iceberg_table(sf_dir)
    got = {
        r["file_path"]
        for r in I.expire_snapshots_plan(spark, root).collect()
    }
    ids = {int(p.split("part-")[1].split(".")[0]) for p in got}
    assert ids and all(d % 9 == 8 for d in ids)  # exactly the churn class
    # keeping the OLD snapshot instead: nothing orphans (100 is a superset)
    assert (
        I.expire_snapshots_plan(spark, root, keep_snapshot_id=100).count()
        == 0
    )
