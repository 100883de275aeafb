"""EXIF APP1 parse (sources/exif.py): TIFF IFD walk in both byte
orders, GPS rationals as exact integer components, loud refusal of
structural damage — the PII-audit surface for crawled images."""

import struct

import pytest

from shared_etl_pipelines_spark.sources.exif import (
    encode_exif_app1,
    parse_exif_app1,
)

GPS = (45, 30, 1234, "N", 122, 15, 99, "W")


def test_round_trip_both_byte_orders():
    for be in (False, True):
        d = parse_exif_app1(
            encode_exif_app1(
                "maker-3", "model-7", 6, "2023:01:05 12:00:00",
                gps=GPS, big_endian=be,
            )
        )
        assert (d["make"], d["model"], d["orientation"]) == (
            "maker-3", "model-7", 6,
        )
        assert d["datetime"] == "2023:01:05 12:00:00"
        assert d["has_gps"] and d["n_tags"] == 5
        assert (d["lat_deg"], d["lat_min"], d["lat_sec_centi"]) == (45, 30, 1234)
        assert (d["lat_ref"], d["lon_ref"]) == ("N", "W")
        assert (d["lon_deg"], d["lon_min"], d["lon_sec_centi"]) == (122, 15, 99)
        d2 = parse_exif_app1(
            encode_exif_app1("m", "n", 1, "2020:01:01 00:00:00", big_endian=be)
        )
        assert not d2["has_gps"] and d2["n_tags"] == 4
        assert d2["lat_ref"] == "" and d2["lat_deg"] == 0


def test_inline_vs_outline_ascii_values():
    # <=4-byte strings pack inline in the entry slot; longer ones go
    # out-of-line via offset — both must decode
    d = parse_exif_app1(
        encode_exif_app1("abc", "a-much-longer-model-name", 1,
                         "2020:01:01 00:00:00")
    )
    assert d["make"] == "abc"
    assert d["model"] == "a-much-longer-model-name"


def test_refusals_are_loud():
    app1 = encode_exif_app1("m", "n", 1, "2020:01:01 00:00:00", gps=GPS)
    with pytest.raises(ValueError, match="not EXIF"):
        parse_exif_app1(b"XXXX\x00\x00" + app1[6:])
    with pytest.raises(ValueError, match="byte order"):
        parse_exif_app1(b"Exif\x00\x00ZZ" + app1[8:])
    # entry count overrunning the segment
    bad = bytearray(app1)
    struct.pack_into("<H", bad, 14, 9999)
    with pytest.raises(ValueError, match="overruns"):
        parse_exif_app1(bytes(bad))
    # value offset past the end
    truncated = app1[:40]
    with pytest.raises(ValueError):
        parse_exif_app1(truncated)
    # zero-denominator GPS rational
    zden = bytearray(app1)
    idx = len(app1) - 48  # first latitude rational (d_num, d_den)
    struct.pack_into("<I", zden, idx + 4, 0)
    with pytest.raises(ValueError, match="denominator"):
        parse_exif_app1(bytes(zden))


def test_spark_exif_gps_audit_classes(spark):
    from shared_etl_pipelines_spark.sources.multimodal import (
        jpeg_exif_scan,
        synthetic_exif_jpeg_assets,
    )

    docs = spark.createDataFrame(
        [(d, "y" * (3 + d)) for d in range(1, 40)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in jpeg_exif_scan(synthetic_exif_jpeg_assets(docs)).collect()
    }
    assert len(rows) == 39
    for d, r in rows.items():
        if d % 5 == 0:
            assert r["reason"] == "no_exif" and not r["has_exif"]
        elif d % 17 == 0:
            assert r["reason"] == "exif_malformed" and not r["has_exif"]
        else:
            assert r["has_exif"] and r["make"] == f"maker-{d % 7}"
            assert r["orientation"] == d % 8 + 1
            if d % 3 != 0:
                assert r["has_gps"] and r["lat_deg"] == d % 90
                assert r["lon_sec_centi"] == (d * 53) % 6000
            else:
                assert not r["has_gps"] and r["lat_ref"] == ""
