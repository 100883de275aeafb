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


# ---------------------------------------------------------------------------
# format-version-2 row-level deletes (snapshot_rows merge-on-read)
# ---------------------------------------------------------------------------


def test_v2_position_deletes_drop_named_rows(spark, sf_dir):
    root = I.ensure_demo_iceberg_v2_table(sf_dir)
    rows = I.snapshot_rows(spark, root).collect()
    base = {r["doc_id"] for r in rows if r["data_seq"] == 1}
    # position-deleted churn docs are gone from the seq-1 base rows
    assert base and all(d % 9 != 8 for d in base)


def test_v2_equality_delete_honors_strict_sequence_rule(spark, sf_dir):
    root = I.ensure_demo_iceberg_v2_table(sf_dir)
    rows = I.snapshot_rows(spark, root).collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["data_seq"], set()).add(r["doc_id"])
    # seq-1 rows matching the equality values are erased...
    assert all(d % 11 != 3 for d in by_seq[1])
    # ...but the seq-2 re-adds of the SAME values survive (strictly-
    # smaller rule) and carry the doubled size that proves which copy won
    readd = [r for r in rows if r["data_seq"] == 2]
    assert readd and all(r["doc_id"] % 11 == 3 and r["doc_id"] % 5 == 0 for r in readd)
    sizes = {r["doc_id"]: r["size"] for r in readd}
    assert all(v % 2 == 0 for v in sizes.values())


def test_v2_row_count_matches_closed_form(spark, sf_dir):
    import pyarrow.parquet as pq

    root = I.ensure_demo_iceberg_v2_table(sf_dir)
    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    ids = range(n_docs)
    expect = sum(1 for d in ids if d % 9 != 8 and d % 11 != 3) + sum(
        1 for d in ids if d % 11 == 3 and d % 5 == 0
    )
    assert I.snapshot_rows(spark, root).count() == expect


def test_v2_no_data_manifests_refuses(tmp_path, spark, sf_dir):
    import shutil

    root = I.ensure_demo_iceberg_v2_table(sf_dir)
    t = str(tmp_path / "tbl")
    shutil.copytree(root, t)
    # rewrite the manifest list so every manifest claims content=1
    from shared_etl_pipelines_spark.sources.avro import read_avro_ocf, write_avro_ocf

    meta = I.read_table_metadata(t)
    lp = meta["snapshots"][0]["manifest-list"]
    recs = read_avro_ocf(open(lp, "rb").read())["records"]
    for r in recs:
        r["content"] = 1
    dst = os.path.join(t, "metadata", "snap-300.avro")
    with open(dst, "wb") as fh:
        fh.write(write_avro_ocf(recs, I.MANIFEST_FILE_V2_SCHEMA, sync=b"\x03" * 16))
    meta["snapshots"][0]["manifest-list"] = dst
    with open(os.path.join(t, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="no data manifests"):
        I.snapshot_rows(spark, t)


def test_rewrite_plan_targets_only_delete_affected_files(spark, sf_dir):
    root = I.ensure_demo_iceberg_v2_table(sf_dir)
    plan = I.rewrite_data_plan(spark, root).collect()
    names = {r["file_path"].rsplit("/", 1)[-1] for r in plan}
    # every seq-1 base file is in scope (equality delete at seq 2)...
    assert names and all(n.startswith("b1-") for n in names)
    # ...and the seq-2 re-add file is correctly OUT of the plan
    assert "b2-readd.parquet" not in names
    assert all(r["eq_delete_applies"] for r in plan)
    assert any(r["n_pos_deletes"] > 0 for r in plan)
