"""FLAC codec (sources/flac.py): bit-exact round trips across every
subframe family, Rice escape paths, UTF-8 frame numbering, the CRC-8/
CRC-16/MD5 integrity chain, loud refusal of stereo decorrelation, and
the Spark-side stats operator."""

import numpy as np
import pytest

from shared_etl_pipelines_spark.sources.flac import (
    decode_flac,
    encode_flac,
    is_flac,
)

RNG = np.random.default_rng(29)


@pytest.mark.parametrize(
    "mode", ["VERBATIM", "FIXED0", "FIXED1", "FIXED2", "FIXED3", "FIXED4", "LPC1"]
)
def test_round_trip_every_subframe_family(mode):
    s = (RNG.integers(-3000, 3000, size=700) + np.arange(700) * 5).astype(
        np.int64
    )
    blob = encode_flac(s, mode=mode)
    assert is_flac(blob)
    dec, info = decode_flac(blob)
    np.testing.assert_array_equal(dec[:, 0], s)
    assert info["n_samples"] == 700 and info["n_frames"] == 3
    assert info["subframe_types"] == (
        "LPC" if mode == "LPC1" else ("VERBATIM" if mode == "VERBATIM" else "FIXED")
    )
    assert (info["sample_rate"], info["channels"], info["bps"]) == (8000, 1, 16)


def test_constant_and_stereo_round_trip():
    s = np.full(300, -777, dtype=np.int64)
    dec, info = decode_flac(encode_flac(s, mode="CONSTANT"))
    np.testing.assert_array_equal(dec[:, 0], s)
    assert info["subframe_types"] == "CONSTANT"
    st = np.stack(
        [np.arange(500) % 997 - 400, (np.arange(500) * 7) % 1003 - 500], axis=1
    ).astype(np.int64)
    dec, info = decode_flac(encode_flac(st, mode="FIXED2"))
    np.testing.assert_array_equal(dec, st)
    assert info["channels"] == 2


def test_rice_escape_and_multibyte_frame_numbers():
    # huge white noise forces large rice params / the escape path
    s = RNG.integers(-30000, 30000, size=600).astype(np.int64)
    dec, _ = decode_flac(encode_flac(s, mode="FIXED0"))
    np.testing.assert_array_equal(dec[:, 0], s)
    # 150 frames of 2 samples: frame indices cross the 1-byte UTF-8 limit
    s2 = RNG.integers(-100, 100, size=300).astype(np.int64)
    dec2, info2 = decode_flac(encode_flac(s2, block_size=2, mode="VERBATIM"))
    np.testing.assert_array_equal(dec2[:, 0], s2)
    assert info2["n_frames"] == 150


def test_integrity_chain_catches_flips():
    s = (np.arange(500) * 3 % 1999 - 900).astype(np.int64)
    blob = encode_flac(s, mode="FIXED2")
    # frame-body flip -> CRC-16 (or header CRC-8, either is loud)
    ba = bytearray(blob)
    ba[len(ba) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC|sync|truncated|Rice|rice"):
        decode_flac(bytes(ba))
    # STREAMINFO MD5 flip -> caught by the MD5 check (no CRC covers it)
    ba2 = bytearray(blob)
    ba2[30] ^= 0x01  # inside the 16-byte md5 field (bytes 26..42)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(ba2))
    # truncation
    with pytest.raises(ValueError):
        decode_flac(blob[: len(blob) - 7])
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF not flac")


def test_stereo_decorrelation_round_trips():
    """Channel assignments 8/9/10 (left/side, right/side, mid/side —
    what real stereo encoders emit) reconstruct L/R bit-exactly; the
    side subframe's extra bit is honored; a decorrelated frame on a
    MONO stream still fails loud (STREAMINFO disagreement)."""
    st = np.stack(
        [(np.arange(500) * 13) % 3001 - 1500,
         (np.arange(500) * 7) % 2003 - 1000],
        axis=1,
    ).astype(np.int64)
    for sm in ("left_side", "right_side", "mid_side"):
        dec, info = decode_flac(encode_flac(st, mode="FIXED2", stereo_mode=sm))
        np.testing.assert_array_equal(dec, st)
        assert info["channels"] == 2
    # extreme side values exercise the +1-bit subframe width
    ext = np.stack(
        [np.full(300, 32767, dtype=np.int64), np.full(300, -32768, dtype=np.int64)],
        axis=1,
    )
    dec, _ = decode_flac(encode_flac(ext, stereo_mode="mid_side"))
    np.testing.assert_array_equal(dec, ext)
    s = np.arange(200, dtype=np.int64)
    blob = bytearray(encode_flac(s, mode="FIXED1"))
    assert blob[42] == 0xFF
    blob[45] = (8 << 4) | (blob[45] & 0x0F)  # ca=8 on a mono stream
    with pytest.raises(ValueError, match="channel count disagrees"):
        decode_flac(bytes(blob))


def test_spark_flac_stats_and_quarantine(spark):
    from shared_etl_pipelines_spark.sources.multimodal import (
        flac_audio_stats,
        synthetic_flac_assets,
    )

    docs = spark.createDataFrame(
        [(d, "z" * (5 + d)) for d in range(1, 20)], "doc_id long, text string"
    )
    rows = flac_audio_stats(synthetic_flac_assets(docs)).collect()
    assert len(rows) == 19
    quarantined = {r["doc_id"] for r in rows if not r["is_real_decode"]}
    assert quarantined == {9, 18}
    kinds = {
        r["doc_id"] % 4: r["subframe_types"]
        for r in rows
        if r["is_real_decode"]
    }
    assert kinds == {0: "CONSTANT", 1: "VERBATIM", 2: "FIXED", 3: "LPC"}
    # closed-form sum check for one doc
    d = 2
    n = 5 + d
    n_s = 200 + (n % 3) * 100
    a, b = (d * 13) % 1000, d % 7 - 3
    want = sum(a + b * t + ((d + t) % 5 - 2) for t in range(n_s))
    r = next(r for r in rows if r["doc_id"] == d)
    assert r["sum_samples"] == want and r["n_samples"] == n_s
    assert r["n_frames"] == (n_s + 127) // 128


# --------------------------------------------------------------------------
# MP3 frame-header scan (sources/mp3.py) — the no-decode half of the
# audio story.
# --------------------------------------------------------------------------
def test_mp3_scan_census_and_id3():
    from shared_etl_pipelines_spark.sources.mp3 import (
        encode_mp3_frames,
        is_mp3,
        scan_mp3,
    )

    blob = encode_mp3_frames(
        6, bitrate_index=9, sample_rate_index=1, mono=True, id3_size=25
    )
    assert is_mp3(blob)
    info = scan_mp3(blob)
    assert info["version"] == "MPEG1" and info["sample_rate"] == 48000
    assert info["channel_mode"] == "mono" and info["n_frames"] == 6
    assert info["bitrate_kbps_min"] == info["bitrate_kbps_max"] == 128
    assert info["duration_ms"] == 6 * 1152 * 1000 // 48000
    assert info["id3_bytes"] == 35 and not info["truncated"]
    # truncation flags but keeps the whole-frame census
    t = scan_mp3(blob[:-10])
    assert t["n_frames"] == 5 and t["truncated"]


def test_mp3_scan_refusals():
    from shared_etl_pipelines_spark.sources.mp3 import (
        encode_mp3_frames,
        scan_mp3,
    )

    with pytest.raises(ValueError, match="sync"):
        scan_mp3(b"garbage that is long enough to scan")
    blob = bytearray(encode_mp3_frames(2, bitrate_index=5))
    blob[2] &= 0x0F  # bitrate index -> 0: free-format
    with pytest.raises(ValueError, match="free-format"):
        scan_mp3(bytes(blob))


def test_spark_mp3_scan_classes(spark):
    from shared_etl_pipelines_spark.sources.multimodal import (
        mp3_stream_scan,
        synthetic_mp3_assets,
    )

    docs = spark.createDataFrame(
        [(d, "m" * (6 + d)) for d in range(1, 30)], "doc_id long, text string"
    )
    rows = mp3_stream_scan(synthetic_mp3_assets(docs)).collect()
    assert {r["doc_id"] for r in rows if not r["is_scanned"]} == {13, 26}
    trunc = {r["doc_id"] for r in rows if r["truncated"]}
    assert trunc == {11, 22}
    r = next(r for r in rows if r["doc_id"] == 5)
    assert r["id3_bytes"] == 30 + 5 % 30 and r["channel_mode"] == "mono"


def test_flac_unknown_length_stream_decodes():
    """Review r8 #1: STREAMINFO total-samples 0 is the spec-legal
    'unknown' value streamed encoders write — frames must decode to
    EOF, not silently return zero samples."""
    import struct

    from shared_etl_pipelines_spark.sources.flac import _BitWriter

    s = (np.arange(300) * 7 % 1500 - 700).astype(np.int64)
    blob = encode_flac(s, mode="FIXED1", block_size=128)
    si = _BitWriter()
    si.write(128, 16)
    si.write(128, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)  # mono
    si.write(15, 5)  # 16 bps
    si.write(0, 36)  # UNKNOWN total samples
    patched = (
        blob[:8] + si.getvalue() + b"\x00" * 16 + blob[42:]
    )  # zero MD5 too (unknown-length streams cannot precompute it)
    assert len(patched) == len(blob)
    dec, info = decode_flac(patched)
    np.testing.assert_array_equal(dec[:, 0], s)
    assert info["n_samples"] == 300
    # a stream with NO frames at all still fails loud
    with pytest.raises(ValueError, match="zero samples"):
        decode_flac(blob[:8] + si.getvalue() + b"\x00" * 16)
    del struct


def test_flac_stats_quarantines_degenerate_streams(spark):
    """Review r8 #2: a decode that dies (or yields nothing) must become
    a quarantine ROW, never a mid-row executor crash."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.flac import _BitWriter
    from shared_etl_pipelines_spark.sources.multimodal import flac_audio_stats

    si = _BitWriter()
    for bits, val in ((16, 128), (16, 128), (24, 0), (24, 0), (20, 8000),
                      (3, 0), (5, 15), (36, 0)):
        si.write(val, bits)
    frameless = b"fLaC" + b"\x80\x00\x00\x22" + si.getvalue() + b"\x00" * 16
    assets = spark.createDataFrame(
        [(1, bytearray(frameless)), (2, bytearray(b"not flac"))],
        "doc_id long, blob binary",
    ).withColumn("media_type", F.lit("audio/flac"))
    rows = flac_audio_stats(assets).collect()
    assert len(rows) == 2 and all(not r["is_real_decode"] for r in rows)


def test_mp3_tolerates_trailing_tags_and_flags_partial_headers():
    """Review r8 #3/#6: ID3v1 'TAG' trailers and appended ID3v2 chunks
    end the walk cleanly (real crawled MP3s carry them); an ID3v2.4
    footer is included in the leading skip; a cut mid-HEADER flags
    truncated like a cut payload."""
    from shared_etl_pipelines_spark.sources.mp3 import (
        encode_mp3_frames,
        scan_mp3,
    )

    base = encode_mp3_frames(4, bitrate_index=9)
    # ID3v1 trailer
    info = scan_mp3(base + b"TAG" + b"\x00" * 125)
    assert info["n_frames"] == 4 and not info["truncated"]
    # appended ID3v2 chunk
    info2 = scan_mp3(base + b"ID3\x04\x00\x00\x00\x00\x00\x05hello")
    assert info2["n_frames"] == 4 and not info2["truncated"]
    # leading ID3v2 WITH the footer flag: 10 extra bytes to skip
    lead = (
        b"ID3\x04\x00\x10\x00\x00\x00\x05"
        + b"\x00" * 5
        + b"3DI\x04\x00\x10\x00\x00\x00\x05"  # the 10-byte footer
    )
    info3 = scan_mp3(lead + base)
    assert info3["n_frames"] == 4 and info3["id3_bytes"] == len(lead)
    # 2 bytes into the next frame header: truncated, census intact
    info4 = scan_mp3(base + b"\xff\xfb")
    assert info4["n_frames"] == 4 and info4["truncated"]


def test_webdataset_first_dot_key_convention(spark, tmp_path):
    """Review r8 #4: multi-extension members ('42.gt.json') belong to
    sample '42' with modality 'gt.json' — the key is everything before
    the FIRST dot."""
    from shared_etl_pipelines_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset_shards,
    )

    samples = [("000000042", {"jpg": b"img", "gt.json": b"{}"})]
    root = str(tmp_path / "wds_multi")
    write_webdataset_shards(samples, root)
    rows = read_webdataset(spark, root).collect()
    assert {(r["key"], r["ext"]) for r in rows} == {
        ("000000042", "jpg"),
        ("000000042", "gt.json"),
    }
