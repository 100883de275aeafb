"""PNG codec: round trips across every filter type and color type, the
palette expansion path, error handling, and the Spark-side real-decode
dispatch in sources/multimodal.py."""

import numpy as np
import pytest

from shared_etl_pipelines_spark.sources.png import (
    SIGNATURE,
    decode_png,
    encode_png,
    is_png,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 2), (5, 7, 3), (5, 7, 4)])
def test_round_trip_all_filters_and_colors(filter_type, shape):
    arr = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(arr, filter_type=filter_type)
    assert is_png(data)
    got, info = decode_png(data)
    np.testing.assert_array_equal(got, arr.squeeze())
    assert (info["width"], info["height"]) == (shape[1], shape[0])


def test_round_trip_1x1_and_wide():
    for shape in [(1, 1), (1, 300), (300, 1)]:
        arr = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        got, _ = decode_png(encode_png(arr, filter_type=4))
        np.testing.assert_array_equal(got, arr)


def test_palette_expansion():
    """Hand-build a color-type-3 PNG: indices expand through PLTE to RGB."""
    import struct
    import zlib

    from shared_etl_pipelines_spark.sources.png import _chunk

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    got, info = decode_png(data)
    assert info["channels"] == 3
    np.testing.assert_array_equal(got[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(got[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(got[1, 0], [0, 0, 255])


def test_multi_idat_stream():
    """IDAT may be split arbitrarily; the decoder must concatenate."""
    arr = RNG.integers(0, 256, size=(4, 4), dtype=np.uint8)
    data = encode_png(arr, filter_type=2)
    # split the single IDAT into two chunks
    import struct
    import zlib

    from shared_etl_pipelines_spark.sources.png import _chunk, _chunks

    parts = {c: b for c, b in _chunks(data)}
    body = parts[b"IDAT"]
    rebuilt = (
        SIGNATURE
        + _chunk(b"IHDR", parts[b"IHDR"])
        + _chunk(b"IDAT", body[:3])
        + _chunk(b"IDAT", body[3:])
        + _chunk(b"IEND", b"")
    )
    got, _ = decode_png(rebuilt)
    np.testing.assert_array_equal(got, arr)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    arr = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(arr))
    # unknown interlace method (last byte of the 13-byte IHDR body)
    data[8 + 8 + 12] = 2
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(bytes(data))
    # claiming Adam7 over a sequential stream fails loud, not garbage
    data[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="IDAT size mismatch"):
        decode_png(bytes(data))


def test_decode_images_dispatch(spark):
    """PNG blobs take the real path; others fall back to the stub."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.multimodal import decode_images

    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rows = [
        (1, "image/png", bytearray(encode_png(arr, filter_type=1))),
        (2, "application/octet-stream", bytearray(b"not an image")),
    ]
    assets = spark.createDataFrame(
        rows, "doc_id long, media_type string, blob binary"
    )
    got = {r["doc_id"]: r for r in decode_images(assets).collect()}
    assert got[1]["is_real_decode"] is True
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (4, 3, 1)
    assert got[1]["px_sum"] == int(arr.sum())
    assert got[2]["is_real_decode"] is False


def test_synthetic_png_assets_spec(spark):
    """The fixture generator produces real PNGs whose pixel stats match
    the closed form the oracle uses."""
    from shared_etl_pipelines_spark.sources.multimodal import synthetic_png_assets

    df = spark.createDataFrame(
        [(3, "x" * 37), (4, "y" * 200)], "doc_id long, text string"
    )
    for r in synthetic_png_assets(df).collect():
        blob = bytes(r["blob"])
        assert is_png(blob)
        arr, info = decode_png(blob)
        n = 37 if r["doc_id"] == 3 else 200
        assert info["width"] == n % 16 + 1
        assert info["height"] == (n // 16) % 16 + 1
        want = sum((r["doc_id"] * 31 + i) % 256 for i in range(arr.size))
        assert int(arr.astype("int64").sum()) == want


def test_gif_roundtrip_and_lzw_schedule():
    """GIF87a round trip across shapes that exercise every LZW width
    bump and the table-overflow Clear, plus the KwKwK case via
    low-entropy data; decoder also validated on a hand-packed LSB-first
    stream independent of the encoder."""
    import numpy as np

    from shared_etl_pipelines_spark.sources.gif import (
        _lzw_decode_gif,
        _lzw_encode_gif,
        decode_gif,
        encode_gif,
        is_gif,
    )

    rng = np.random.default_rng(2)
    for shape in ((1, 1), (7, 13), (64, 64), (33, 257), (200, 301)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        blob = encode_gif(img)
        assert is_gif(blob)
        assert np.array_equal(decode_gif(blob), img), shape
    low = rng.integers(0, 3, size=500_000).astype(np.uint8).tobytes()
    assert _lzw_decode_gif(_lzw_encode_gif(low)) == low
    # hand-packed LSB-first 9-bit stream: CLEAR, 'A'(65), 'B'(66),
    # 258('AB'), EOI -> "ABAB"
    codes = [256, 65, 66, 258, 257]
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 9
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    assert _lzw_decode_gif(bytes(out)) == b"ABAB"


def test_decode_images_gif_branch(spark, sf_dir):
    """The multimodal decoder recognizes GIF blobs and decodes them for
    real (is_real_decode=true, exact pixel sums)."""
    from shared_etl_pipelines_spark.queries import REGISTRY

    out = REGISTRY["multimodal_gif_decode"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["is_real_decode"] for r in rows)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (8, 8), (9, 13, 3), (16, 16, 4), (3, 2, 2), (2, 9)]
)
def test_adam7_interlace_round_trip(filter_type, shape):
    """Adam7 streams round-trip exactly across shapes that exercise
    empty passes (dims < 8), all filters, and all color types."""
    arr = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(arr, filter_type=filter_type, interlace=True)
    got, info = decode_png(data)
    assert info["interlace"] == 1
    np.testing.assert_array_equal(got, arr.squeeze())
    # sequential encode of the same pixels decodes identically
    got2, info2 = decode_png(encode_png(arr, filter_type=filter_type))
    assert info2["interlace"] == 0
    np.testing.assert_array_equal(got2, got)


def test_adam7_pass_layout_matches_spec():
    """The seven-pass schedule: an 8x8 image's pixels map to the classic
    Adam7 pass-number grid."""
    from shared_etl_pipelines_spark.sources.png import _adam7_pass_dims

    grid = np.zeros((8, 8), dtype=int)
    for p, (x0, y0, dx, dy, pw, ph) in enumerate(_adam7_pass_dims(8, 8), 1):
        grid[y0::dy, x0::dx] = p
    want = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ]
    )
    np.testing.assert_array_equal(grid, want)


def test_animated_gif_composition_disposal_transparency():
    """GIF89a multi-frame: GCE delays, sub-rectangle composition,
    disposal 2 background restore, transparency skip, and the
    single-frame decoder still reading frame 0 of animated blobs."""
    from shared_etl_pipelines_spark.sources.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animated,
    )

    base = np.full((6, 8), 100, dtype=np.uint8)
    p1 = np.full((3, 4), 20, dtype=np.uint8)
    p2 = np.full((2, 2), 250, dtype=np.uint8)
    blob = encode_gif_animated(
        [(0, 0, base), (2, 1, p1), (5, 3, p2)], delays_cs=[10, 20, 30]
    )
    frames = decode_gif_frames(blob)
    assert [d for _, d in frames] == [10, 20, 30]
    np.testing.assert_array_equal(frames[0][0], base)
    want1 = base.copy()
    want1[1:4, 2:6] = 20
    np.testing.assert_array_equal(frames[1][0], want1)
    want2 = want1.copy()
    want2[3:5, 5:7] = 250
    np.testing.assert_array_equal(frames[2][0], want2)
    # disposal 2: the frame's rect restores to background before the next
    fr2 = decode_gif_frames(
        encode_gif_animated([(0, 0, base), (2, 1, p1), (5, 3, p2)], disposal=2)
    )
    assert fr2[1][0][0, 0] == 0 and fr2[1][0][2, 3] == 20
    # transparent index: matching pixels do not overwrite the canvas
    p3 = np.full((3, 4), 20, dtype=np.uint8)
    p3[0, 0] = 77
    fr3 = decode_gif_frames(
        encode_gif_animated([(0, 0, base), (2, 2, p3)], transparent_index=20)
    )
    c = fr3[1][0]
    assert c[2, 2] == 77 and c[2, 3] == 100 and c[3, 3] == 100
    # single-frame decoder: first frame of an animated stream
    np.testing.assert_array_equal(decode_gif(blob), base)


def test_animated_gif_nonzero_background_restore():
    """ADVICE r7 #3: disposal 2 must restore the screen descriptor's
    background color INDEX (byte 11), not hardcoded palette index 0.
    The encoder's palette is the gray identity, so index 200 -> 200."""
    from shared_etl_pipelines_spark.sources.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = np.full((6, 8), 100, dtype=np.uint8)
    p1 = np.full((3, 4), 20, dtype=np.uint8)
    blob = bytearray(
        encode_gif_animated([(0, 0, base), (2, 1, p1)], disposal=2)
    )
    blob[11] = 200  # logical screen descriptor background color index
    frames = decode_gif_frames(bytes(blob))
    # frame 0's rect (whole canvas) restored to bg=200 before frame 1,
    # then frame 1's sub-rect composed on top
    c = frames[1][0]
    assert c[0, 0] == 200 and c[2, 3] == 20


def test_gif_frame_stats_quarantines_corrupt(spark):
    from shared_etl_pipelines_spark.sources.gif import encode_gif_animated
    from shared_etl_pipelines_spark.sources.multimodal import gif_frame_stats

    good = encode_gif_animated(
        [(0, 0, np.full((4, 4), 9, dtype=np.uint8))], delays_cs=[5]
    )
    assets = spark.createDataFrame(
        [(1, "image/gif", bytearray(good)), (2, "image/gif", bytearray(b"GIF89a trash"))],
        "doc_id long, media_type string, blob binary",
    )
    rows = {r["doc_id"]: r for r in gif_frame_stats(assets).collect()}
    assert rows[1]["is_real_decode"] and rows[1]["px_sum"] == 16 * 9
    assert rows[1]["delay_cs"] == 5
    assert not rows[2]["is_real_decode"] and rows[2]["frame_idx"] == -1


def test_gif_interlaced_round_trip_and_animation():
    """4-pass GIF interlace (rows stored 0::8, 4::8, 2::4, 1::2)
    decodes back to the source image in both the single-frame and the
    animation decoders — the progressive layout real crawled GIFs use
    (was a refusal before round 8)."""
    from shared_etl_pipelines_spark.sources.gif import (
        _interlace_order,
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )

    rng = np.random.default_rng(41)
    for h in (1, 2, 3, 4, 7, 8, 9, 16, 23):
        img = rng.integers(0, 256, (h, 6), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_gif(encode_gif(img, interlaced=True)), img
        )
        # the animation decoder walks the same image block
        frames = decode_gif_frames(encode_gif(img, interlaced=True))
        np.testing.assert_array_equal(frames[0][0], img)
    # the order itself is the published 4-pass schedule
    assert _interlace_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert sorted(_interlace_order(23)) == list(range(23))
