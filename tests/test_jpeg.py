"""Baseline JPEG codec: the block-constant exactness contract the SQL
oracle rides on, lossy-tolerance round trips, color + subsampling,
restart markers, unsupported-variant errors, and the Spark-side
dispatch in sources/multimodal.py."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from shared_etl_pipelines_spark.sources.jpeg import (
    _ZZ_FLAT,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)

RNG = np.random.default_rng(11)


def _block_constant(bh: int, bw: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.int64)
    return np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    # first and last few entries of the T.81 zigzag, flat-indexed
    assert list(_ZZ_FLAT[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
    assert list(_ZZ_FLAT[-4:]) == [47, 55, 62, 63]
    assert sorted(_ZZ_FLAT) == list(range(64))


@pytest.mark.parametrize("bh,bw", [(1, 1), (1, 4), (3, 2), (8, 8)])
def test_block_constant_exact_round_trip(bh, bw):
    """The exactness contract: flat 8x8 blocks + all-ones qtable survive
    encode->decode bit-for-bit — what multimodal_jpeg_decode's closed-
    form oracle relies on."""
    img = _block_constant(bh, bw, seed=bh * 10 + bw)
    blob = encode_jpeg(img)
    assert is_jpeg(blob)
    got, info = decode_jpeg(blob)
    np.testing.assert_array_equal(got, img)
    assert (info["width"], info["height"]) == (bw * 8, bh * 8)
    assert info["channels"] == 1


def test_block_constant_exact_with_restart_markers():
    img = _block_constant(4, 5, seed=3)
    for ri in (1, 2, 3, 7):
        got, info = decode_jpeg(encode_jpeg(img, restart_interval=ri))
        np.testing.assert_array_equal(got, img)
        assert info["restart_interval"] == ri


def test_arbitrary_gray_round_trip_tolerance():
    """Arbitrary content through qtable=1 is near-lossless: the only
    error is forward-DCT rounding, bounded by ±1 per sample... but edge
    padding on non-multiple-of-8 sizes must not bleed either."""
    img = RNG.integers(0, 256, size=(41, 53), dtype=np.uint8)
    got, info = decode_jpeg(encode_jpeg(img))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_quant_table_bounds_error():
    """Coarser quantization loses more — but stays within the classic
    q/2-per-coefficient bound propagated through the IDCT."""
    xx, yy = np.meshgrid(np.arange(48), np.arange(48))
    img = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    for q in (2, 4, 8):
        got, _ = decode_jpeg(encode_jpeg(img, qtable=np.full((8, 8), q)))
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4 * q


def test_color_444_round_trip():
    img = RNG.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    got, info = decode_jpeg(encode_jpeg(img))
    assert info["channels"] == 3
    assert info["subsampling"] == "4:4:4"
    assert got.shape == img.shape
    # YCbCr conversion + DCT rounding both ways
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3


def test_color_420_smooth_round_trip():
    """4:2:0 halves chroma resolution; on a chroma-flat image the loss
    is conversion rounding only."""
    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    lum = ((xx * 2 + yy) % 256).astype(np.uint8)
    img = np.stack([lum, lum, lum], axis=2)  # gray in RGB: Cb=Cr=128
    got, info = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
    assert info["subsampling"] == "4:2:0"
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_odd_sizes_crop_back():
    for shape in [(1, 1), (9, 17), (8, 1), (1, 24), (15, 15, 3)]:
        img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        got, _ = decode_jpeg(encode_jpeg(img))
        assert got.shape == img.shape


def test_unsupported_variants_raise():
    img = _block_constant(1, 1, seed=0)
    blob = bytearray(encode_jpeg(img))
    # flip SOF0 (FFC0) into extended sequential SOF1 (FFC1): still
    # unsupported. (SOF2 progressive is now a real decode path; a
    # baseline stream relabeled SOF2 is MALFORMED progressive — its
    # interleaved full-band scan violates G.1 — and must error, not
    # decode garbage.)
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC1
    with pytest.raises(ValueError, match="SOF1"):
        decode_jpeg(bytes(blob))
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))  # malformed fake-progressive
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(encode_jpeg(img)[:40]))  # truncated


def test_is_jpeg_signature():
    assert is_jpeg(b"\xff\xd8\xff\xe0rest")
    assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
    assert not is_jpeg(b"")


@settings(max_examples=30, deadline=None)
@given(
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    ri=st.integers(0, 4),
)
def test_fuzz_block_constant_exact(bh, bw, seed, ri):
    img = _block_constant(bh, bw, seed)
    got, _ = decode_jpeg(encode_jpeg(img, restart_interval=ri))
    np.testing.assert_array_equal(got, img)


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31 - 1))
def test_fuzz_arbitrary_gray_tolerance(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    got, _ = decode_jpeg(encode_jpeg(img))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_spark_decode_images_dispatches_jpeg(spark, sf_dir):
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.multimodal import (
        decode_images,
        synthetic_jpeg_assets,
    )
    from shared_etl_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(64)
    out = decode_images(synthetic_jpeg_assets(docs)).collect()
    assert len(out) == 64
    assert all(r["is_real_decode"] for r in out)
    for r in out:
        bw = (r["width"] // 8)
        bh = (r["height"] // 8)
        k = np.arange(bw * bh, dtype=np.int64)
        want = int((64 * ((r["doc_id"] * 31 + k) % 256)).sum())
        assert r["px_sum"] == want, r["doc_id"]
    # corrupt blob degrades, never aborts
    bad = docs.limit(1).select(
        F.col("doc_id"),
        F.lit("image/jpeg").alias("media_type"),
        F.lit(b"\xff\xd8\xffgarbage").cast("binary").alias("blob"),
    )
    rows = decode_images(bad).collect()
    assert len(rows) == 1 and not rows[0]["is_real_decode"]


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------


def _prog(img, **kw):
    from shared_etl_pipelines_spark.sources.jpeg import encode_jpeg_progressive

    return encode_jpeg_progressive(img, **kw)


def test_progressive_equals_baseline_decode_exactly():
    """The conformance anchor: both encoders quantize to bit-identical
    coefficients and both entropy codings are lossless on those
    integers, so the decodes must match bit-for-bit — for every
    geometry, subsampling, successive-approximation depth and restart
    interval."""
    rng = np.random.default_rng(42)
    for shape in [(8, 8), (16, 16), (9, 17), (1, 1), (24, 31, 3), (33, 15, 3)]:
        for sub in ["4:4:4"] if len(shape) == 2 else ["4:4:4", "4:2:0"]:
            for al in [0, 1, 2]:
                for ri in [0, 2]:
                    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
                    base, _ = decode_jpeg(
                        encode_jpeg(img, subsampling=sub, restart_interval=ri)
                    )
                    prog, info = decode_jpeg(
                        _prog(img, subsampling=sub, restart_interval=ri, al=al)
                    )
                    assert info["progressive"] is True
                    assert np.array_equal(base, prog), (shape, sub, al, ri)


def test_progressive_block_constant_exact():
    """The closed-form oracle contract holds through the progressive
    path too: block-constant images survive encode->decode bit-exactly
    with the all-ones quantization table."""
    img = _block_constant(3, 4, seed=9)
    got, info = decode_jpeg(_prog(img, al=1))
    assert info["progressive"] and np.array_equal(got, img)
    rgb = np.stack([img, img[::-1], img[::-1, ::-1]], 2)
    got3, _ = decode_jpeg(_prog(rgb, al=1))
    assert np.array_equal(got3, rgb)


def test_progressive_truncated_after_dc_scan_is_dc_approximation():
    """Scan independence: a stream cut after the DC-first scan decodes
    to the blockwise-DC approximation — flat 8x8 blocks within ~1 of
    each block's true mean (Al=1 loses the DC low bit)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    data = _prog(img, al=1)
    # cut just before the SECOND SOS marker
    first = data.find(b"\xff\xda")
    second = data.find(b"\xff\xda", first + 2)
    assert second > 0
    got, info = decode_jpeg(data[:second] + b"\xff\xd9")
    assert got.shape == img.shape and info["progressive"]
    for by in range(4):
        for bx in range(4):
            blk = got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert blk.min() == blk.max()  # DC-only => flat
            true_mean = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].mean()
            assert abs(int(blk[0, 0]) - true_mean) <= 1.5


def test_progressive_long_eob_runs():
    """A flat-gray image makes every AC band empty: the whole scan is
    one EOBn run with appended length bits (r > 0) — the run path a
    per-block EOB0 encoder would never exercise."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    got, _ = decode_jpeg(_prog(img, al=1))
    assert np.array_equal(got, img)
    # sparse variant: one hot block in a sea of zeros splits the run
    img2 = np.full((64, 64), 128, dtype=np.uint8)
    img2[30, 30] = 255
    base, _ = decode_jpeg(encode_jpeg(img2))
    prog, _ = decode_jpeg(_prog(img2, al=1))
    assert np.array_equal(base, prog)


def test_scan_markers_reads_headers_without_decode():
    """Marker walk recovers frame type, geometry, scan count, DRI and
    COM from both entropy codings; non-JPEG raises; decode is
    unaffected by a COM segment."""
    import numpy as np
    import pytest

    from shared_etl_pipelines_spark.sources import jpeg

    arr = (np.arange(16 * 24) % 256).astype(np.uint8).reshape(16, 24)
    b = jpeg.encode_jpeg(arr, restart_interval=2, comment=b"cam-3")
    m = jpeg.scan_markers(b)
    assert (m["sof"], m["width"], m["height"]) == ("SOF0", 24, 16)
    assert m["n_scans"] == 1 and m["restart_interval"] == 2
    assert m["comment"] == "cam-3" and m["jfif_version"] == "1.01"

    for al in (0, 1, 2):
        p = jpeg.encode_jpeg_progressive(arr, al=al, comment=b"x")
        mp = jpeg.scan_markers(p)
        # grayscale script: DC first + 2 AC bands + al*(DC+AC refine)
        assert (mp["sof"], mp["n_scans"]) == ("SOF2", 3 + 2 * al)

    with pytest.raises(ValueError):
        jpeg.scan_markers(b"not a jpeg at all")
    # decode ignores the COM segment entirely
    px, _ = jpeg.decode_jpeg(b)
    px2, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, restart_interval=2))
    assert (px == px2).all()
