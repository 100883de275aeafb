"""OGG container walk (sources/ogg.py): RFC 3533 page framing, the
OGG CRC, lacing/packet reassembly incl. page-spanning packets, Vorbis
ident/comment headers, and loud refusal of every malformation class."""

import struct

import pytest

from shared_etl_pipelines_spark.sources.ogg import (
    encode_ogg_vorbis,
    is_ogg,
    ogg_crc,
    parse_ogg,
)


def _blob(**kw):
    args = dict(
        channels=2,
        sample_rate=44100,
        vendor="spark-graft-0.9",
        comments=["title=t", "lang=en"],
        audio_packets=[bytes(range(200)), bytes(300), b"x" * 255],
        total_granule=44100 * 3,
    )
    args.update(kw)
    return encode_ogg_vorbis(**args)


def test_round_trip_census_and_headers():
    blob = _blob()
    assert is_ogg(blob)
    d = parse_ogg(blob)
    assert d["n_pages"] == 5  # BOS + headers + 3 audio pages
    assert d["n_packets"] == 6  # 3 headers + 3 audio
    assert (d["channels"], d["sample_rate"]) == (2, 44100)
    assert d["duration_ms"] == 3000
    assert d["vendor"] == "spark-graft-0.9"
    assert d["comments"] == ["title=t", "lang=en"]
    assert d["audio_bytes"] == 200 + 300 + 255
    assert d["n_audio_packets"] == 3


def test_known_crc_vector():
    # OGG CRC is NOT zlib: poly 0x04C11DB7, zero init, no reflection.
    # Independent check against a hand-computed property: appending the
    # big-endian CRC of a message must NOT give 0 (no final-xor
    # residue), and the empty string hashes to 0.
    assert ogg_crc(b"") == 0
    import zlib

    msg = b"OggS\x00\x02" + bytes(20)
    assert ogg_crc(msg) != (zlib.crc32(msg) & 0xFFFFFFFF)
    # linearity spot-check: crc(m) changes if any byte flips
    m2 = bytearray(msg)
    m2[3] ^= 1
    assert ogg_crc(bytes(m2)) != ogg_crc(msg)


def test_packet_spanning_page_boundary():
    pkt = bytes(i % 251 for i in range(700))
    blob = _blob(
        audio_packets=[pkt, b"z" * 10], split_first_audio=True
    )
    d = parse_ogg(blob)
    # BOS + header page + 2 pages for the split packet + 1 for the rest
    assert d["n_pages"] == 5
    assert d["audio_bytes"] == 710
    assert d["n_audio_packets"] == 2


def test_exact_255_multiple_packet_zero_lacing():
    # a packet of exactly 510 bytes needs lacing [255, 255, 0]
    blob = _blob(audio_packets=[b"a" * 510])
    d = parse_ogg(blob)
    assert d["audio_bytes"] == 510 and d["n_audio_packets"] == 1


def test_refusals_are_loud_and_named():
    blob = _blob()
    with pytest.raises(ValueError, match="OggS"):
        parse_ogg(b"RIFF" + blob[4:])
    # CRC: flip one payload byte of the last page
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(bad))
    # version
    bad = bytearray(blob)
    bad[4] = 1
    # version byte is covered by the CRC, so recompute it to isolate
    # the version check
    nsegs = bad[26]
    body = sum(bad[27 : 27 + nsegs])
    page = bytearray(bad[: 27 + nsegs + body])
    page[22:26] = b"\x00\x00\x00\x00"
    bad[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="version"):
        parse_ogg(bytes(bad))
    # truncation inside a page payload
    with pytest.raises(ValueError, match="truncated"):
        parse_ogg(blob[:-10])
    # missing EOS: chop the final page off entirely
    last_page_off = blob.rindex(b"OggS")
    with pytest.raises(ValueError, match="EOS"):
        parse_ogg(blob[:last_page_off])
    # sequence gap: renumber page 1 as 7 (fix its CRC so only the gap
    # trips)
    p1 = blob.index(b"OggS", 4)
    bad = bytearray(blob)
    struct.pack_into("<I", bad, p1 + 18, 7)
    nsegs = bad[p1 + 26]
    body = sum(bad[p1 + 27 : p1 + 27 + nsegs])
    page = bytearray(bad[p1 : p1 + 27 + nsegs + body])
    page[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", bad, p1 + 22, ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg(bytes(bad))


def test_comment_overrun_refused():
    # comment header whose declared vendor length overruns the packet
    blob = _blob(vendor="v" * 10, comments=[])
    # find the comment packet and inflate its vendor length field
    idx = blob.index(b"\x03vorbis")
    bad = bytearray(blob)
    struct.pack_into("<I", bad, idx + 7, 10_000)
    # fix the containing page's CRC
    # (comment packet sits on page 1)
    p1 = blob.index(b"OggS", 4)
    nsegs = bad[p1 + 26]
    body = sum(bad[p1 + 27 : p1 + 27 + nsegs])
    page = bytearray(bad[p1 : p1 + 27 + nsegs + body])
    page[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", bad, p1 + 22, ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="vendor"):
        parse_ogg(bytes(bad))


def test_spark_ogg_page_scan_rows_and_quarantine(spark):
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.multimodal import (
        ogg_page_scan,
        synthetic_ogg_assets,
    )

    docs = spark.createDataFrame(
        [(d, "y" * (3 + d)) for d in range(1, 25)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in ogg_page_scan(synthetic_ogg_assets(docs)).collect()}
    assert len(rows) == 24
    for d, r in rows.items():
        if d % 7 == 0:
            assert not r["is_valid"] and r["reason"] == "crc_mismatch"
        else:
            n = 3 + d
            n_headers = 2 if d % 3 == 1 else 3  # opus: OpusHead+OpusTags
            assert r["is_valid"] and r["n_packets"] == n_headers + (n % 5 + 2)
            assert r["channels"] == d % 2 + 1
            assert r["n_comments"] == d % 3 + 1
    # non-OGG junk quarantines as not_ogg
    junk = spark.createDataFrame(
        [(99, bytearray(b"not an ogg"))], "doc_id long, blob binary"
    ).withColumn("media_type", F.lit("audio/ogg"))
    q = ogg_page_scan(junk).collect()[0]
    assert not q["is_valid"] and q["reason"] == "not_ogg"


def test_opus_round_trip_and_pre_skip_duration():
    from shared_etl_pipelines_spark.sources.ogg import (
        encode_ogg_opus,
        parse_ogg,
    )

    aud = [bytes(range(40 + i)) for i in range(3)]
    blob = encode_ogg_opus(
        channels=2, input_sample_rate=16000, pre_skip=312,
        vendor="spark-graft-0.9", comments=["artist=a", "title=t"],
        audio_packets=aud, total_granule=48000 * 2 + 312,
    )
    d = parse_ogg(blob)
    assert d["codec"] == "opus"
    assert d["n_packets"] == 5 and d["n_pages"] == 5
    assert d["channels"] == 2 and d["sample_rate"] == 16000
    # duration runs on the 48 kHz granule clock minus pre-skip
    assert d["duration_ms"] == 2000 and d["pre_skip"] == 312
    assert d["comments"] == ["artist=a", "title=t"]
    assert d["audio_bytes"] == sum(len(a) for a in aud)


def test_opus_refusals():
    from shared_etl_pipelines_spark.sources.ogg import (
        encode_ogg_opus,
        ogg_crc,
        parse_ogg,
    )

    blob = encode_ogg_opus(1, 8000, 0, "v", [], [b"x" * 30], 4800)
    # version != 1 (recompute page 0's CRC so only the version trips)
    bad = bytearray(blob)
    head_off = blob.index(b"OpusHead") + 8
    bad[head_off] = 9
    nsegs = bad[26]
    body = sum(bad[27 : 27 + nsegs])
    page = bytearray(bad[: 27 + nsegs + body])
    page[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", bad, 22, ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="OpusHead version"):
        parse_ogg(bytes(bad))
    # non-zero channel mapping family refused
    blob2 = encode_ogg_opus(1, 8000, 0, "v", [], [b"x" * 30], 4800)
    bad2 = bytearray(blob2)
    fam_off = blob2.index(b"OpusHead") + 18
    bad2[fam_off] = 1
    page = bytearray(bad2[: 27 + nsegs + body])
    page[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", bad2, 22, ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="mapping family"):
        parse_ogg(bytes(bad2))


def test_spark_ogg_scan_mixes_vorbis_and_opus(spark):
    from shared_etl_pipelines_spark.sources.multimodal import (
        ogg_page_scan,
        synthetic_ogg_assets,
    )

    docs = spark.createDataFrame(
        [(d, "y" * (3 + d)) for d in range(1, 25)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in ogg_page_scan(synthetic_ogg_assets(docs)).collect()
    }
    for d, r in rows.items():
        if d % 7 == 0:
            assert not r["is_valid"]
            continue
        if d % 3 == 1:
            assert r["codec"] == "opus"
            assert r["pre_skip"] == 312 + d % 100
            assert r["duration_ms"] == (d % 1000 + 1000) * 1000 // 48000
        else:
            assert r["codec"] == "vorbis" and r["pre_skip"] == 0
