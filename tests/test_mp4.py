"""MP4/ISO-BMFF container walk (sources/mp4.py): box grammar, sample
table resolution (stsc runs x stsz x stco, stss sync flags), MJPEG
sample decode exactness, loud avc1 quarantine, and the Spark-side
scan/decode operators in sources/multimodal.py."""

import struct

import numpy as np
import pytest

from shared_etl_pipelines_spark.sources.mp4 import (
    decode_mp4_frames,
    encode_mp4,
    encode_mp4_mjpeg,
    is_mp4,
    parse_mp4,
)


def _block_frames(d: int, nf: int, bh: int, bw: int) -> np.ndarray:
    k = np.arange(bh * bw, dtype=np.int64)
    out = []
    for f in range(nf):
        blocks = ((d * 31 + f * 11 + k) % 256).astype(np.uint8).reshape(bh, bw)
        out.append(np.repeat(np.repeat(blocks, 8, 0), 8, 1))
    return np.stack(out)


def test_mjpeg_mp4_round_trip_and_metadata():
    frames = _block_frames(7, 4, 2, 3)  # 4 frames of 16x24
    blob = encode_mp4_mjpeg(frames, fps=10, keyframe_interval=2)
    assert is_mp4(blob)
    info = parse_mp4(blob)
    assert info["brand"] == "isom"
    assert info["duration_ms"] == 400  # 4 frames @ 10 fps
    (t,) = info["tracks"]
    assert (t["handler"], t["codec"]) == ("vide", "jpeg")
    assert (t["width"], t["height"]) == (24, 16)
    assert (t["n_samples"], t["n_keyframes"]) == (4, 2)
    # keyframes decode bit-exactly (block-constant contract)
    dec, _ = decode_mp4_frames(blob, keyframes_only=True)
    assert [i for i, _ in dec] == [0, 2]
    for i, arr in dec:
        np.testing.assert_array_equal(arr, frames[i])
    # full decode covers every sample
    dec_all, _ = decode_mp4_frames(blob, keyframes_only=False)
    assert [i for i, _ in dec_all] == [0, 1, 2, 3]
    for i, arr in dec_all:
        np.testing.assert_array_equal(arr, frames[i])


def test_sample_table_resolution_multi_chunk():
    """7 variable-size samples in chunks of 3 -> 3 stco entries and a
    two-run stsc (runs of 3 then the short tail of 1); every resolved
    (offset, size) must slice the exact payload back out of the blob."""
    payloads = [bytes([i] * (10 + 3 * i)) for i in range(7)]
    blob = encode_mp4(
        payloads, 8, 8, codec=b"avc1", keyframe_interval=3, samples_per_chunk=3
    )
    (t,) = parse_mp4(blob)["tracks"]
    assert t["n_samples"] == 7
    assert t["n_keyframes"] == 3  # samples 1, 4, 7
    got = [blob[o : o + s] for o, s, _ in t["samples"]]
    assert got == payloads
    syncs = [sync for _, _, sync in t["samples"]]
    assert syncs == [True, False, False, True, False, False, True]


def test_audio_track_no_stss_means_all_sync():
    frames = _block_frames(3, 2, 1, 1)
    blob = encode_mp4_mjpeg(frames, audio_samples=[b"aaa", b"bbbb", b"c"])
    tracks = {t["handler"]: t for t in parse_mp4(blob)["tracks"]}
    a = tracks["soun"]
    assert a["codec"] == "mp4a"
    assert a["n_samples"] == 3
    assert a["n_keyframes"] == 3  # absent stss == every sample sync
    assert a["width"] is None and a["height"] is None
    # audio payloads resolve too
    got = [blob[o : o + s] for o, s, _ in a["samples"]]
    assert got == [b"aaa", b"bbbb", b"c"]


def test_box_size_zero_extends_to_eof():
    """size==0 means 'to end of file' (ISO 14496-12 4.2) — rewrite the
    trailing moov's size field to 0 and the parse must not change."""
    frames = _block_frames(5, 3, 2, 2)
    blob = bytearray(encode_mp4_mjpeg(frames))
    # find the top-level moov (encoder writes ftyp, mdat, moov)
    off = 0
    while off < len(blob):
        (size,) = struct.unpack_from(">I", blob, off)
        if blob[off + 4 : off + 8] == b"moov":
            assert off + size == len(blob)
            struct.pack_into(">I", blob, off, 0)
            break
        off += size
    info = parse_mp4(bytes(blob))
    assert info["tracks"][0]["n_samples"] == 3


def test_avc1_scans_but_decode_quarantines_loudly():
    payloads = [b"\x00\x00\x01\x65" * 6] * 3
    blob = encode_mp4(payloads, 32, 16, codec=b"avc1")
    (t,) = parse_mp4(blob)["tracks"]
    assert t["codec"] == "avc1" and t["n_samples"] == 3
    with pytest.raises(ValueError, match="avc1.*quarantine"):
        decode_mp4_frames(blob)


def test_malformed_containers_fail_loud():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00\x00\x00\x08free")
    frames = _block_frames(2, 2, 1, 1)
    blob = encode_mp4_mjpeg(frames)
    with pytest.raises(ValueError):  # truncated mid-moov
        parse_mp4(blob[: len(blob) - 40])


def test_spark_mp4_scan_and_keyframe_stats(spark):
    """Spark-side dispatch over a mixed fixture corpus: jpeg docs fan
    out decoded keyframe rows, avc1 docs quarantine with the fourcc in
    reason, odd docs carry the stub audio track, corrupt blobs get the
    handler='corrupt' row."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.multimodal import (
        mp4_keyframe_stats,
        mp4_track_scan,
        synthetic_mp4_assets,
    )

    docs = spark.createDataFrame(
        [(d, "x" * (4 + d)) for d in range(1, 13)], "doc_id long, text string"
    )
    assets = synthetic_mp4_assets(docs)
    scan = mp4_track_scan(assets).collect()
    by_doc: dict = {}
    for r in scan:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(1, 13):
        handlers = sorted(r["handler"] for r in by_doc[d])
        assert handlers == (["soun", "vide"] if d % 2 else ["vide"])
        vid = next(r for r in by_doc[d] if r["handler"] == "vide")
        assert vid["codec"] == ("avc1" if d % 3 == 0 else "jpeg")
        n = 4 + d
        assert vid["n_samples"] == n % 3 + 2
    stats = mp4_keyframe_stats(assets)
    rows = stats.collect()
    q = [r for r in rows if not r["is_real_decode"]]
    assert {r["reason"] for r in q} == {"codec:avc1"}
    assert {r["doc_id"] for r in q} == {3, 6, 9, 12}
    ok = [r for r in rows if r["is_real_decode"]]
    assert all(r["frame_idx"] % 2 == 0 for r in ok)
    # closed-form pixel check for one row
    r = next(r for r in ok if r["doc_id"] == 1 and r["frame_idx"] == 0)
    n = 4 + 1
    bw, bh = n % 4 + 1, (n // 4) % 4 + 1
    want = 64 * sum((1 * 31 + 0 * 11 + k) % 256 for k in range(bw * bh))
    assert r["px_sum"] == want and r["width"] == 8 * bw
    # corrupt blob quarantines at the scan level
    bad = spark.createDataFrame(
        [(99, bytearray(b"nonsense bytes"))], "doc_id long, blob binary"
    ).withColumn("media_type", F.lit("video/mp4"))
    crow = mp4_track_scan(bad).collect()
    assert len(crow) == 1 and crow[0]["handler"] == "corrupt"
