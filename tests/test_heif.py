"""HEIF/HEIC item parsing (sources/heif.py)."""
import pytest

from shared_etl_pipelines_spark.sources import heif


def _items():
    return [
        dict(item_id=1, item_type="hvc1", payload=b"\x01\x02\x03" * 10,
             ispe=(100, 58), hvcc=(1, 93, 0)),
        dict(item_id=2, item_type="hvc1", payload=b"\x04" * 5,
             ispe=(32, 20), hvcc=(2, 120, 1)),
        dict(item_id=3, item_type="Exif", payload=b"ExifMM" + b"\x00" * 8),
        dict(item_id=4, item_type="grid",
             payload=bytes([0, 0, 1, 1]) + (200).to_bytes(2, "big")
             + (116).to_bytes(2, "big")),
    ]


def test_roundtrip_items_properties_and_primary():
    out = heif.parse_heif(heif.encode_heif(_items(), primary_id=1))
    assert out["brand"] == "heic" and out["primary_id"] == 1
    by = {i["item_id"]: i for i in out["items"]}
    assert by[1]["is_primary"] and not by[2]["is_primary"]
    assert (by[1]["width"], by[1]["height"]) == (100, 58)
    assert (by[1]["hevc_profile"], by[1]["hevc_level"]) == (1, 93)
    assert (
        by[2]["hevc_profile"], by[2]["hevc_level"], by[2]["hevc_tier"]
    ) == (2, 120, 1)
    assert by[1]["n_bytes"] == 30
    assert by[3]["item_type"] == "Exif" and by[3]["n_bytes"] == 14
    assert (by[4]["grid_rows"], by[4]["grid_cols"]) == (2, 2)
    assert (by[4]["width"], by[4]["height"]) == (200, 116)


def test_refusals():
    blob = heif.encode_heif(_items(), primary_id=1)
    with pytest.raises(ValueError):
        heif.parse_heif(b"xxxxftypmp42")  # wrong brand
    with pytest.raises(ValueError):
        heif.parse_heif(blob[:40])  # torn meta
    with pytest.raises(ValueError):
        heif.parse_heif(blob[:-3])  # extent overruns file
    with pytest.raises(ValueError):
        heif.encode_heif([], primary_id=1)
    # grid payload shorter than its header refuses
    bad = heif.encode_heif(
        [dict(item_id=1, item_type="grid", payload=b"\x00\x00\x01")],
        primary_id=1,
    )
    with pytest.raises(ValueError):
        heif.parse_heif(bad)


def test_32bit_grid_fields():
    g = bytes([0, 1, 0, 0]) + (70000).to_bytes(4, "big") \
        + (50000).to_bytes(4, "big")
    blob = heif.encode_heif(
        [dict(item_id=1, item_type="grid", payload=g)], primary_id=1
    )
    it = heif.parse_heif(blob)["items"][0]
    assert (it["width"], it["height"]) == (70000, 50000)
    assert (it["grid_rows"], it["grid_cols"]) == (1, 1)


def test_struct_errors_surface_as_valueerror():
    """Self-review (r9-continued): fixed-width field truncation inside
    meta must quarantine as ValueError, never leak struct.error."""
    blob = heif.encode_heif(_items(), primary_id=1)
    for cut in range(30, len(blob), 17):
        try:
            heif.parse_heif(blob[:cut])
        except ValueError:
            pass  # the only acceptable failure
