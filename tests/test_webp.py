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


# ---------------------------------------------------------------------------
# SVG audit (sources/svg.py, r9-continued) — shares the image-audit suite
# ---------------------------------------------------------------------------
def test_svg_dims_census_and_flags():
    from shared_etl_pipelines_spark.sources.svg import parse_svg

    xml = (
        '<svg xmlns="http://www.w3.org/2000/svg" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" width="200px" '
        'height="100">'
        '<rect x="0" y="0" width="4" height="4" onload="x()"/>'
        '<circle cx="1" cy="1" r="2"/>'
        '<text x="1" y="2">hi <tspan>there</tspan></text>'
        "<script>fetch('http://x')</script>"
        '<image xlink:href="http://cdn.test/i.png"/>'
        '<image href="data:image/png;base64,AAAA"/>'
        "</svg>"
    )
    o = parse_svg(xml)
    assert (o["width"], o["height"]) == (200.0, 100.0)
    assert o["n_shapes"] == 2 and o["n_text"] == 1
    assert o["text_chars"] == len("hi ") + len("there")
    assert o["has_script"] and o["has_event_handlers"]
    assert o["has_external_ref"] and o["has_embedded_image"]


def test_svg_viewbox_fallback_and_refusals():
    import pytest

    from shared_etl_pipelines_spark.sources.svg import parse_svg

    o = parse_svg('<svg viewBox="0 0 320 180"><path d="M0 0"/></svg>')
    assert (o["width"], o["height"]) == (320.0, 180.0)
    # width wins over viewBox when both present
    o = parse_svg('<svg width="10" viewBox="0 0 320 180"/>')
    assert (o["width"], o["height"]) == (10.0, 180.0)
    # contextual units are refused into 0, not guessed
    o = parse_svg('<svg width="50%" height="2em"/>')
    assert (o["width"], o["height"]) == (0.0, 0.0)
    with pytest.raises(ValueError):
        parse_svg("<svg><unclosed></svg")
    with pytest.raises(ValueError):
        parse_svg("<html><svg/></html>")
    with pytest.raises(ValueError):
        parse_svg('<svg viewBox="0 0 1"/>')
