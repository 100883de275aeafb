"""Avro OCF reader/writer (sources/avro.py)."""
import pytest

from shared_etl_pipelines_spark.sources import avro

SCHEMA = {
    "type": "record", "name": "Rec", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "raw", "type": "bytes"},
    ],
}
RECS = [
    {"id": -5, "name": "héllo", "score": 1.625, "ok": True,
     "tags": ["a", "b"], "note": None, "kind": "B",
     "attrs": {"x": 1, "y": -2}, "raw": b"\x00\xff"},
    {"id": 2 ** 40, "name": "", "score": -0.5, "ok": False, "tags": [],
     "note": "n", "kind": "C", "attrs": {}, "raw": b""},
    {"id": 7, "name": "r3", "score": 3.0, "ok": True, "tags": ["z"],
     "note": "q", "kind": "A", "attrs": {"k": 9}, "raw": b"1"},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("block_size", [None, 2])
def test_roundtrip(codec, block_size):
    blob = avro.write_avro_ocf(
        RECS, SCHEMA, codec=codec, sync=bytes(range(16)),
        block_size=block_size,
    )
    out = avro.read_avro_ocf(blob)
    assert out["records"] == RECS
    assert out["codec"] == codec
    assert out["n_blocks"] == (1 if block_size is None else 2)
    assert out["schema"]["name"] == "Rec"


def test_zigzag_extremes():
    schema = {"type": "record", "name": "R",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 2 ** 62, -(2 ** 62), 63, -64]
    blob = avro.write_avro_ocf(
        [{"v": v} for v in vals], schema, sync=b"s" * 16
    )
    assert [r["v"] for r in avro.read_avro_ocf(blob)["records"]] == vals


def test_container_refusals():
    blob = avro.write_avro_ocf(RECS, SCHEMA, sync=bytes(range(16)))
    with pytest.raises(ValueError):
        avro.read_avro_ocf(b"Obj\x02" + blob[4:])  # bad magic
    with pytest.raises(ValueError):
        avro.read_avro_ocf(blob[:-8])  # truncated trailer
    with pytest.raises(ValueError):
        avro.read_avro_ocf(blob[:-17] + b"\xff" * 17)  # torn sync
    # unsupported codec refuses by name
    bad = blob.replace(b"null", b"zstd", 1)
    with pytest.raises(ValueError):
        avro.read_avro_ocf(bad)


def test_schema_refusals():
    with pytest.raises(ValueError):
        avro.write_avro_ocf([], {"type": "fixed", "name": "f", "size": 4})
    with pytest.raises(ValueError):
        avro.write_avro_ocf([], ["string", "long"])  # non-null union
    with pytest.raises(ValueError):
        avro.write_avro_ocf([], {"type": "enum", "name": "e", "symbols": []})
    with pytest.raises(ValueError):
        avro.write_avro_ocf([], "uuid")
    with pytest.raises(ValueError):
        # snappy gained support in r11; zstandard stays refused by name
        avro.write_avro_ocf([], SCHEMA, codec="zstandard")
    with pytest.raises(ValueError):
        avro.write_avro_ocf([], SCHEMA, sync=b"short")


# ---------------------------------------------------------------------------
# schema resolution (spec "Schema Resolution")
# ---------------------------------------------------------------------------


def test_resolution_promotions_defaults_and_drops():
    from shared_etl_pipelines_spark.sources.avro import (
        read_avro_ocf_resolved,
        write_avro_ocf,
    )

    writer = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "doc_id", "type": "int"},
            {"name": "quality", "type": "float"},
            {"name": "legacy", "type": "string"},
        ],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "quality", "type": "double"},
            {"name": "lang", "type": "string", "default": "und"},
            {"name": "tags", "type": {"type": "array", "items": "string"},
             "default": []},
        ],
    }
    blob = write_avro_ocf([{"doc_id": 7, "quality": 0.25, "legacy": "x"}], writer)
    out = read_avro_ocf_resolved(blob, reader)
    assert out["records"] == [
        {"doc_id": 7, "quality": 0.25, "lang": "und", "tags": []}
    ]


def test_resolution_union_and_string_bytes():
    from shared_etl_pipelines_spark.sources.avro import (
        read_avro_ocf_resolved,
        write_avro_ocf,
    )

    w = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": ["null", "string"]}]}
    r = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": ["null", "bytes"]}]}
    blob = write_avro_ocf([{"x": "hey"}, {"x": None}], w)
    assert read_avro_ocf_resolved(blob, r)["records"] == [
        {"x": b"hey"}, {"x": None}
    ]


def test_resolution_refusals():
    import pytest as _pt

    from shared_etl_pipelines_spark.sources.avro import (
        read_avro_ocf_resolved,
        write_avro_ocf,
    )

    w = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "long"}]}
    blob = write_avro_ocf([{"x": 1}], w)
    narrow = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "int"}]}
    with _pt.raises(ValueError, match="promote"):
        read_avro_ocf_resolved(blob, narrow)
    missing = {"type": "record", "name": "r",
               "fields": [{"name": "y", "type": "int"}]}
    with _pt.raises(ValueError, match="no default"):
        read_avro_ocf_resolved(blob, missing)


def test_snappy_codec_roundtrip_and_crc_guard():
    import zlib as _zlib  # noqa: F401

    sch = {"type": "record", "name": "r",
           "fields": [{"name": "x", "type": "long"}]}
    blob = avro.write_avro_ocf(
        [{"x": i} for i in range(100)], sch, codec="snappy"
    )
    out = avro.read_avro_ocf(blob)
    assert out["codec"] == "snappy"
    assert [r["x"] for r in out["records"]] == list(range(100))
    # corrupt a payload byte: either the snappy decode or the spec's
    # CRC32-of-uncompressed must catch it
    bad = bytearray(blob)
    bad[-18] ^= 0xFF
    with pytest.raises(ValueError, match="snappy|CRC|sync"):
        avro.read_avro_ocf(bytes(bad))


def test_resolution_refuses_non_nullable_writer_union():
    # a 2-non-null-branch writer union loses the decoded value's branch
    # in this resolver — it must refuse, not guess the wrong type
    from shared_etl_pipelines_spark.sources.avro import resolve_value

    with pytest.raises(ValueError, match="writer union"):
        resolve_value(7, ["int", "string"], "long")
    with pytest.raises(ValueError, match="writer union"):
        resolve_value(7, ["null", "int", "string"], "long")
    # the nullable 2-branch shape (the only one the decoder emits) works
    assert resolve_value(7, ["null", "int"], "long") == 7
    assert resolve_value(None, ["null", "int"], ["null", "long"]) is None
