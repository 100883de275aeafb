"""WebP container parsing (sources/webp.py)."""
import pytest

from shared_etl_pipelines_spark.sources import webp


def test_vp8_simple_lossy_dims_from_bitstream():
    o = webp.parse_webp(webp.encode_webp_vp8(320, 176, b"xx"))
    assert o == {
        "kind": "vp8", "width": 320, "height": 176, "has_alpha": False,
        "has_animation": False, "n_frames": 1,
    }


def test_vp8l_lossless_header():
    o = webp.parse_webp(webp.encode_webp_vp8l(1001, 7, alpha=True))
    assert (o["kind"], o["width"], o["height"]) == ("vp8l", 1001, 7)
    assert o["has_alpha"] is True
    # 14-bit max
    o = webp.parse_webp(webp.encode_webp_vp8l(16384, 16384))
    assert (o["width"], o["height"]) == (16384, 16384)


def test_vp8x_extended_still_and_animation():
    o = webp.parse_webp(webp.encode_webp_vp8x(640, 360, alpha=True))
    assert (o["kind"], o["width"], o["height"]) == ("vp8x", 640, 360)
    assert o["has_alpha"] and not o["has_animation"] and o["n_frames"] == 1
    o = webp.parse_webp(webp.encode_webp_vp8x(64, 48, n_anim_frames=3))
    assert o["has_animation"] and o["n_frames"] == 3


def test_odd_sized_chunk_padding():
    # VP8L body is 6 bytes (even) — force odd via VP8 filler
    blob = webp.encode_webp_vp8(64, 48, b"z")  # 10+1 = odd body
    assert webp.parse_webp(blob)["width"] == 64


def test_refusals():
    with pytest.raises(ValueError):
        webp.parse_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        webp.parse_webp(webp.encode_webp_vp8(64, 48)[:14])
    with pytest.raises(ValueError):
        webp.parse_webp(b"")
    # VP8L reserved version bits refuse
    blob = bytearray(webp.encode_webp_vp8l(10, 10))
    blob[-2] |= 0xE0  # version bits live in the top of the 4-byte field
    with pytest.raises(ValueError):
        webp.parse_webp(bytes(blob))
    # VP8X reserved flags refuse
    blob = bytearray(webp.encode_webp_vp8x(64, 48))
    vp8x_at = blob.find(b"VP8X") + 8
    blob[vp8x_at] |= 0x01
    with pytest.raises(ValueError):
        webp.parse_webp(bytes(blob))
    # non-keyframe VP8 chunk refuses
    from shared_etl_pipelines_spark.sources.mkv import encode_vp8_interframe

    bad = webp._riff(webp._chunk(b"VP8 ", encode_vp8_interframe(3)))
    with pytest.raises(ValueError):
        webp.parse_webp(bad)
