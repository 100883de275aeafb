"""Deletion vectors: portable roaring codec, z85, DV file framing, and
the Delta snapshot_rows merge — including refusal paths."""

import os
import struct

import pytest

from shared_etl_pipelines_spark.sources import deltalog as D
from shared_etl_pipelines_spark.sources.deletion_vectors import (
    deserialize_dv,
    read_dv_descriptor,
    serialize_dv,
    write_dv_file,
    z85_decode,
    z85_encode,
)
from shared_etl_pipelines_spark.sources.roaring import (
    deserialize_roaring,
    serialize_roaring,
)


def test_roaring_roundtrip_array_and_bitmap_containers():
    import random

    rng = random.Random(11)
    for n in (0, 1, 7, 4096, 4097, 9000):
        vals = {rng.randrange(0, 1 << 20) for _ in range(n)}
        assert deserialize_roaring(serialize_roaring(vals)) == sorted(vals)
    dense = set(range(0, 60000, 3))  # one >4096-card (bitmap) container
    assert deserialize_roaring(serialize_roaring(dense)) == sorted(dense)


def test_roaring_run_container_decodes():
    # hand-crafted cookie-12347 blob: 1 run container holding [10..20]
    blob = (
        struct.pack("<HH", 12347, 0)
        + bytes([0x01])
        + struct.pack("<HH", 0, 10)
        + struct.pack("<H", 1)
        + struct.pack("<HH", 10, 10)
    )
    assert deserialize_roaring(blob) == list(range(10, 21))


def test_roaring_refuses_bad_cookie_and_truncation():
    with pytest.raises(ValueError, match="bad cookie"):
        deserialize_roaring(struct.pack("<II", 99, 0))
    good = serialize_roaring({1, 2, 3})
    with pytest.raises(ValueError, match="truncated"):
        deserialize_roaring(good[:-1])


def test_z85_roundtrip_and_refusals():
    import random

    rng = random.Random(5)
    for _ in range(50):
        b = bytes(rng.randrange(256) for _ in range(4 * rng.randrange(0, 9)))
        assert z85_decode(z85_encode(b)) == b
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="bad character"):
        z85_decode("~~~~~")


def test_dv_array_roundtrip_spans_32bit_boundary():
    pos = [0, 5, 9999, (1 << 32) + 7, (2 << 32) + 1]
    assert deserialize_dv(serialize_dv(pos), 5) == sorted(pos)
    with pytest.raises(ValueError, match="cardinality mismatch"):
        deserialize_dv(serialize_dv(pos), 4)


def test_dv_file_crc_guard(tmp_path):
    f = str(tmp_path / "dv.bin")
    spans = write_dv_file(f, [[1, 2, 3]])
    off, size = spans[0]
    desc = {
        "storageType": "p", "pathOrInlineDv": f,
        "offset": off, "sizeInBytes": size, "cardinality": 3,
    }
    assert read_dv_descriptor(str(tmp_path), desc) == [1, 2, 3]
    blob = bytearray(open(f, "rb").read())
    blob[off + 4 + 2] ^= 0xFF  # flip a payload byte; CRC must catch it
    open(f, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC mismatch|bad cookie|truncated"):
        read_dv_descriptor(str(tmp_path), desc)


def test_snapshot_rows_applies_dvs_all_storage_types(spark, sf_dir):
    root = D.ensure_demo_delta_dv_table(sf_dir)
    rows = D.snapshot_rows(spark, root).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids and all(d % 9 != 8 for d in ids)  # churn rows are gone
    kinds = {r["dv_storage"] for r in rows}
    assert {"p", "u", "i"} <= kinds  # every storage type exercised
    # files without churn docs carry no DV and keep all their rows
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    assert len(rows) == sum(1 for d in range(n_docs) if d % 9 != 8)


def test_dv_aware_checkpoint_roundtrip(tmp_path, spark, sf_dir):
    """write_checkpoint carries deletionVector through, and a reader of
    the checkpointed state still resolves the same live rows."""
    import shutil

    root = D.ensure_demo_delta_dv_table(sf_dir)
    t = str(tmp_path / "tbl")
    shutil.copytree(root, t)
    before = {(r["doc_id"], r["dv_storage"]) for r in D.snapshot_rows(spark, t).collect()}
    D.write_checkpoint(spark, t, 2)
    after = {(r["doc_id"], r["dv_storage"]) for r in D.snapshot_rows(spark, t).collect()}
    assert before == after


def test_uuid_storage_with_slash_in_z85(tmp_path):
    """The z85 alphabet contains '/'; uuid parsing must take the LAST
    20 chars, never split on '/'. UUID(int=69) encodes with a trailing
    slash and is the regression that failed at sf0.1."""
    import uuid

    u = uuid.UUID(int=69)
    enc = z85_encode(u.bytes)
    assert "/" in enc
    f = str(tmp_path / f"deletion_vector_{u}.bin")
    spans = write_dv_file(f, [[3, 4]])
    desc = {
        "storageType": "u", "pathOrInlineDv": enc,
        "offset": spans[0][0], "sizeInBytes": spans[0][1], "cardinality": 2,
    }
    assert read_dv_descriptor(str(tmp_path), desc) == [3, 4]


def test_dv_purge_plan_lists_exactly_the_dv_carriers(spark, sf_dir):
    root = D.ensure_demo_delta_dv_table(sf_dir)
    plan = D.dv_purge_plan(spark, root).collect()
    assert plan and all(r["dv_cardinality"] > 0 for r in plan)
    assert {r["dv_storage"] for r in plan} == {"p", "u", "i"}
    # purging then... a DV-free table plans nothing: the original COW
    # demo log never carries DVs
    from shared_etl_pipelines_spark.sources.deltalog import (
        ensure_demo_delta_table,
    )

    cow = ensure_demo_delta_table(sf_dir)
    assert D.dv_purge_plan(spark, cow).count() == 0


def test_bitmap_index_build_and_slice(spark, sf_dir):
    """One-pass tag->bitmap index + AND/OR/ANDNOT slicing (the corpus
    slicer): bitmaps carry exactly the key's ids, slices match set
    algebra, unknown keys refuse."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.roaring import (
        bitmap_slice,
        build_bitmap_index,
        deserialize_roaring,
    )
    from shared_etl_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(200)
    tags = docs.select(
        "doc_id",
        F.concat(F.lit("k"), (F.col("doc_id") % 4).cast("string")).alias("tag"),
    )
    idx = build_bitmap_index(tags, "tag", "doc_id").collect()
    assert {r["key"] for r in idx} == {"k0", "k1", "k2", "k3"}
    for r in idx:
        ids = deserialize_roaring(bytes(r["bitmap"]))
        assert len(ids) == r["cardinality"]
        assert all(i % 4 == int(r["key"][1]) for i in ids)
    rows = [(r["key"], bytes(r["bitmap"])) for r in idx]
    got = bitmap_slice(rows, ["or", "k1", "k3"])
    assert got and all(i % 2 == 1 for i in got)
    assert bitmap_slice(rows, ["and", "k1", "k3"]) == []
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown key"):
        bitmap_slice(rows, ["and", "k1", "nope"])
