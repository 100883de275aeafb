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


# ---------------------------------------------------------------------------
# Codec stream parameters (r9): SPS exp-Golomb decode, avcC record,
# esds AudioSpecificConfig — public-spec bitstreams, round-tripped
# against the in-repo encoders and hand-built bit patterns.
# ---------------------------------------------------------------------------


def test_sps_round_trip_profiles_and_crop():
    from shared_etl_pipelines_spark.sources import mp4

    cases = [
        (8, 8, 66, 30),      # 16x16 coded + crop 4/4 (both axes)
        (24, 16, 77, 31),    # crop width only
        (16, 24, 66, 40),    # crop height only
        (320, 240, 100, 41),  # mb-aligned, high profile (chroma branch)
        (1920, 1080, 100, 51),  # 1088 coded, crop_bottom 4
    ]
    for w, h, prof, lvl in cases:
        d = mp4.parse_sps(mp4.encode_sps(w, h, prof, lvl))
        assert (d["width"], d["height"]) == (w, h)
        assert (d["profile_idc"], d["level_idc"]) == (prof, lvl)
        assert d["chroma_format_idc"] == 1 and d["bit_depth"] == 8
        assert d["frame_mbs_only"] == 1


def test_sps_scaling_matrix_skipped_not_misparsed():
    # hand-build a high-profile SPS WITH seq_scaling_matrix_present=1
    # and one present 4x4 list — parse must skip it and still land on
    # the right dimensions
    from shared_etl_pipelines_spark.sources.mp4 import (
        _BitWriter,
        _insert_emulation,
        parse_sps,
    )

    w = _BitWriter()
    w.u(1, 0); w.u(2, 3); w.u(5, 7)
    w.u(8, 100); w.u(8, 0); w.u(8, 40)
    w.ue(0)      # sps id
    w.ue(1)      # chroma 4:2:0
    w.ue(0); w.ue(0); w.u(1, 0)
    w.u(1, 1)    # seq_scaling_matrix_present_flag
    w.u(1, 1)    # list 0 present
    for _ in range(16):
        w.se(1)  # delta_scale run
    for _ in range(7):
        w.u(1, 0)  # lists 1..7 absent
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(2)      # poc type 2 (neither extra branch)
    w.ue(1); w.u(1, 0)
    w.ue(4); w.ue(2)   # 80 x 48 coded
    w.u(1, 1); w.u(1, 1)
    w.u(1, 0)    # no crop
    w.u(1, 0)    # no vui
    nal = w.rbsp()
    d = parse_sps(nal[:1] + _insert_emulation(nal[1:]))
    assert (d["width"], d["height"]) == (80, 48)
    assert d["profile_idc"] == 100


def test_sps_interlaced_height_doubles():
    # frame_mbs_only=0: height = 2 * map_units * 16, CropUnitY = 4
    from shared_etl_pipelines_spark.sources.mp4 import _BitWriter, parse_sps

    w = _BitWriter()
    w.u(1, 0); w.u(2, 3); w.u(5, 7)
    w.u(8, 77); w.u(8, 0); w.u(8, 30)
    w.ue(0); w.ue(0); w.ue(2)
    w.ue(1); w.u(1, 0)
    w.ue(44); w.ue(17)  # 720 x (18*16*2 = 576)
    w.u(1, 0)           # frame_mbs_only = 0 (interlaced)
    w.u(1, 0)           # mb_adaptive_frame_field_flag
    w.u(1, 1)
    w.u(1, 1); w.ue(0); w.ue(0); w.ue(0); w.ue(2)  # crop_bottom 2 -> -8
    w.u(1, 0)
    d = parse_sps(w.rbsp())
    assert (d["width"], d["height"]) == (720, 568)
    assert d["frame_mbs_only"] == 0


def test_emulation_prevention_round_trip_property():
    import random

    from shared_etl_pipelines_spark.sources.mp4 import (
        _insert_emulation,
        _strip_emulation,
    )

    rng = random.Random(42)
    for _ in range(500):
        raw = bytes(
            rng.choice([0, 0, 0, 1, 2, 3, 0xFF])
            for _ in range(rng.randint(0, 64))
        )
        nal = _insert_emulation(raw)
        for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert bad not in nal
        assert _strip_emulation(nal) == raw


def test_avcc_record_multi_sps_and_truncation():
    from shared_etl_pipelines_spark.sources import mp4

    sps_a = mp4.encode_sps(64, 32, 66, 30)
    sps_b = mp4.encode_sps(128, 96, 66, 31)
    rec = mp4.encode_avcc([sps_a, sps_b], [b"\x68\xce\x38\x80"])
    d = mp4.parse_avcc(rec)
    assert d["n_sps"] == 2 and d["n_pps"] == 1
    assert (d["width"], d["height"]) == (64, 32)  # first SPS wins
    assert d["rec_profile"] == 66 and d["rec_level"] == 30
    assert d["nal_length_size"] == 4
    with pytest.raises(ValueError, match="truncated"):
        mp4.parse_avcc(rec[:10])
    with pytest.raises(ValueError, match="configurationVersion"):
        mp4.parse_avcc(b"\x02" + rec[1:])
    with pytest.raises(ValueError, match="no SPS"):
        mp4.parse_avcc(bytes([1, 66, 0, 30, 0xFF, 0xE0]) + b"\x00")


def test_esds_asc_round_trip_and_rate_escape():
    from shared_etl_pipelines_spark.sources import mp4

    for rate, ch in [(96000, 1), (44100, 2), (8000, 2), (7350, 1)]:
        box = mp4.encode_esds(rate, ch)
        d = mp4._parse_esds(box, 8, len(box))
        assert d["object_type_indication"] == 0x40
        assert (d["sample_rate"], d["channels"]) == (rate, ch)
        assert d["object_type"] == 2
    # non-table rate -> 24-bit explicit escape
    box = mp4.encode_esds(19999, 2)
    d = mp4._parse_esds(box, 8, len(box))
    assert d["sample_rate"] == 19999
    # reserved frequency index refuses
    asc = bytes([0b00010_110, 0b1_0010_000])  # aot 2, idx 13 (reserved)
    with pytest.raises(ValueError, match="reserved samplingFrequency"):
        mp4.parse_audio_specific_config(asc)


def test_container_carries_codec_params_end_to_end():
    from shared_etl_pipelines_spark.sources import mp4

    samples = [bytes(range(30 + i)) for i in range(3)]
    blob = mp4.encode_mp4(
        samples, 24, 8, codec=b"avc1", avc_params=(100, 41),
        audio_samples=[b"a" * 10, b"b" * 11], aac_params=(22050, 1),
    )
    tracks = mp4.parse_mp4(blob)["tracks"]
    vid = next(t for t in tracks if t["handler"] == "vide")
    aud = next(t for t in tracks if t["handler"] == "soun")
    vp, ap = vid["codec_params"], aud["codec_params"]
    assert (vp["profile_idc"], vp["level_idc"]) == (100, 41)
    assert (vp["width"], vp["height"]) == (24, 8)  # via crop rectangle
    assert (ap["sample_rate"], ap["channels"]) == (22050, 1)
    # tracks WITHOUT extradata surface None, not garbage
    plain = mp4.encode_mp4(samples, 24, 8, codec=b"jpeg")
    assert mp4.parse_mp4(plain)["tracks"][0]["codec_params"] is None


def test_spark_mp4_codec_params_quarantine(spark):
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources import mp4
    from shared_etl_pipelines_spark.sources.multimodal import (
        mp4_codec_params,
    )

    samples = [bytes(range(30))]
    good = mp4.encode_mp4(samples, 32, 16, codec=b"avc1", avc_params=(77, 31))
    # corrupt the avcC payload: version byte 9 -> loud per-track reason
    bad = good.replace(b"avcC\x01", b"avcC\x09")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, bytearray(b"junk"))],
        "doc_id long, blob binary",
    ).withColumn("media_type", F.lit("video/mp4"))
    rows = {r["doc_id"]: r for r in mp4_codec_params(df).collect()}
    assert rows[1]["has_params"] and rows[1]["profile_idc"] == 77
    assert rows[1]["sps_width"] == 32 and rows[1]["sps_height"] == 16
    assert not rows[2]["has_params"]
    assert "configurationVersion" in rows[2]["reason"]
    assert rows[3]["handler"] == "corrupt" and not rows[3]["has_params"]


# ---------------------------------------------------------------------------
# HEVC (r9-continued): hvcC + H.265 SPS stream parameters
# ---------------------------------------------------------------------------
def test_hevc_sps_roundtrip_profiles_chroma_bitdepth():
    from shared_etl_pipelines_spark.sources import mp4

    for (w, h, p, lv, t, c, bd) in [
        (100, 58, 1, 93, 0, 1, 8),    # 4:2:0, conformance crop both axes
        (64, 48, 2, 120, 1, 1, 10),   # Main10, no crop
        (66, 50, 3, 90, 0, 2, 8),     # 4:2:2
        (65, 49, 4, 123, 0, 3, 8),    # 4:4:4 allows odd display dims
    ]:
        out = mp4.parse_hevc_sps(mp4.encode_hevc_sps(w, h, p, lv, t, c, bd))
        assert (out["width"], out["height"]) == (w, h)
        assert (out["profile_idc"], out["level_idc"], out["tier_flag"]) \
            == (p, lv, t)
        assert (out["chroma_format_idc"], out["bit_depth"]) == (c, bd)


def test_hevc_sps_refusals():
    import pytest

    from shared_etl_pipelines_spark.sources import mp4

    nal = mp4.encode_hevc_sps(100, 58)
    with pytest.raises(ValueError):
        mp4.parse_hevc_sps(nal[:8])          # truncated bitstream
    with pytest.raises(ValueError):
        mp4.parse_hevc_sps(b"\x80" + nal[1:])  # forbidden bit set
    with pytest.raises(ValueError):
        mp4.parse_hevc_sps(bytes([0x40]) + nal[1:])  # wrong NAL type
    with pytest.raises(ValueError):
        mp4.encode_hevc_sps(101, 58)         # off the 4:2:0 chroma grid


def test_hvcc_roundtrip_and_crosscheck():
    import pytest

    from shared_etl_pipelines_spark.sources import mp4

    sps = mp4.encode_hevc_sps(100, 58, 1, 93, 0)
    rec = mp4.encode_hvcc(sps, 1, 93, 0)
    out = mp4.parse_hvcc(rec)
    assert (out["width"], out["height"]) == (100, 58)
    assert (out["profile_idc"], out["level_idc"]) == (1, 93)
    # record-vs-SPS mismatch refuses loudly (re-mux defect)
    with pytest.raises(ValueError):
        mp4.parse_hvcc(mp4.encode_hvcc(sps, 2, 93, 0))
    with pytest.raises(ValueError):
        mp4.parse_hvcc(rec[:15])
    with pytest.raises(ValueError):
        mp4.parse_hvcc(bytes([2]) + rec[1:])  # bad version
    # a record whose only array is PPS-type carries no SPS
    no_sps = bytearray(rec[:23])
    no_sps[22] = 1
    no_sps += bytes([0x80 | 34]) + (1).to_bytes(2, "big") \
        + (2).to_bytes(2, "big") + b"\x44\x01"
    with pytest.raises(ValueError):
        mp4.parse_hvcc(bytes(no_sps))


def test_hev1_container_scan_yields_params():
    from shared_etl_pipelines_spark.sources import mp4

    blob = mp4.encode_mp4(
        [b"x" * 30, b"y" * 31], 100, 58, codec=b"hev1",
        hevc_params=(2, 120, 1),
    )
    t0 = mp4.parse_mp4(blob)["tracks"][0]
    assert t0["codec"] == "hev1"
    p = t0["codec_params"]
    assert (p["width"], p["height"]) == (100, 58)
    assert (p["profile_idc"], p["level_idc"], p["tier_flag"]) == (2, 120, 1)
    assert p["bit_depth"] == 10  # Main10 implies 10-bit in the fixture
