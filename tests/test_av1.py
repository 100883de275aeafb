"""AV1 sequence-header OBU + av1C record (sources/av1.py)."""
import pytest

from shared_etl_pipelines_spark.sources import av1, mp4


@pytest.mark.parametrize(
    "kw,exp_chroma",
    [
        (dict(width=320, height=180, profile=0, level=8, tier=1,
              bit_depth=8), 1),
        (dict(width=1921, height=1081, profile=0, level=12, bit_depth=10), 1),
        (dict(width=100, height=70, profile=1, level=4, bit_depth=10), 3),
        (dict(width=640, height=360, profile=2, level=8, tier=1,
              bit_depth=12), 2),
        (dict(width=640, height=360, profile=2, level=0, bit_depth=10), 2),
        (dict(width=64, height=64, profile=0, level=4, bit_depth=8,
              mono=True), 0),
        (dict(width=128, height=96, profile=0, level=5, bit_depth=8,
              reduced_still_picture=True), 1),
        (dict(width=256, height=144, profile=0, level=8, bit_depth=8,
              timing_info=(1000, 90000, 2)), 1),
    ],
)
def test_seq_header_roundtrip(kw, exp_chroma):
    out = av1.parse_av1_seq_header(av1.encode_av1_seq_header(**kw))
    assert (out["width"], out["height"]) == (kw["width"], kw["height"])
    assert out["profile_idc"] == kw["profile"]
    assert out["level_idc"] == kw["level"]
    assert out["bit_depth"] == kw["bit_depth"]
    assert out["mono_chrome"] == (1 if kw.get("mono") else 0)
    assert out["chroma_format_idc"] == exp_chroma
    assert out["reduced"] == (1 if kw.get("reduced_still_picture") else 0)
    if kw["level"] > 7 and not kw.get("reduced_still_picture"):
        assert out["tier_flag"] == kw.get("tier", 0)


def test_av1c_roundtrip_and_mismatch():
    obu = av1.encode_av1_seq_header(320, 180, 0, 8, 1, 8)
    info = av1.parse_av1_seq_header(obu)
    rec = av1.encode_av1c(obu, info)
    assert av1.parse_av1c(rec) == info
    bad = bytearray(rec)
    bad[1] ^= 0x20  # flip a profile bit in the record summary
    with pytest.raises(ValueError):
        av1.parse_av1c(bytes(bad))
    with pytest.raises(ValueError):
        av1.parse_av1c(rec[:4])
    with pytest.raises(ValueError):
        av1.parse_av1c(bytes([0x80]) + rec[1:])  # bad marker/version


def test_seq_header_refusals():
    obu = av1.encode_av1_seq_header(320, 180)
    with pytest.raises(ValueError):
        av1.parse_av1_seq_header(b"")
    with pytest.raises(ValueError):
        av1.parse_av1_seq_header(obu[:4])  # truncated payload
    with pytest.raises(ValueError):
        av1.parse_av1_seq_header(bytes([0x30]) + obu[1:])  # frame OBU type
    with pytest.raises(ValueError):
        av1.encode_av1_seq_header(64, 64, profile=1, mono=True)
    with pytest.raises(ValueError):
        av1.encode_av1_seq_header(64, 64, profile=0, bit_depth=12)


def test_av01_container_scan_yields_params():
    blob = mp4.encode_mp4(
        [b"k" * 22, b"l" * 23], 325, 183, codec=b"av01",
        av1_params=dict(profile=2, level=12, tier=1, bit_depth=12),
    )
    t0 = mp4.parse_mp4(blob)["tracks"][0]
    assert t0["codec"] == "av01"
    p = t0["codec_params"]
    assert (p["width"], p["height"]) == (325, 183)
    assert (p["profile_idc"], p["level_idc"], p["tier_flag"]) == (2, 12, 1)
    assert (p["bit_depth"], p["chroma_format_idc"]) == (12, 2)
