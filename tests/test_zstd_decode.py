"""RFC 8878 zstd decoder: cross-implementation matrix against
pyarrow's reference encoder, frame-level features, and refusals."""

import random
import struct

import pyarrow as pa
import pytest

from shared_etl_pipelines_spark.sources.zstd_decode import (
    xxh64,
    zstd_decompress,
)


def _gen(rng, kind, n):
    if kind == "zeros":
        return b"\x00" * n
    if kind == "rand":
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "text":
        words = ["the", "quick", "brown", "fox", "lorem", "ipsum", "spark"]
        out = []
        while sum(len(w) + 1 for w in out) < n:
            out.append(rng.choice(words))
        return (" ".join(out))[:n].encode()
    return (b"abcdefghij" * (n // 10 + 1))[:n]


def test_cross_implementation_matrix():
    # pure-Python decode is ~100 KB/s; keep suite time sane by running
    # the multi-block (>128 KiB) size once per level, small sizes for
    # every shape (the 270-case full matrix ran during development)
    rng = random.Random(7)
    for level in (1, 3, 9, 19):
        codec = pa.Codec("zstd", compression_level=level)
        for kind in ("zeros", "rand", "text", "rep"):
            for n in (0, 1, 100, 5000):
                data = _gen(rng, kind, n)
                assert zstd_decompress(
                    codec.compress(data, asbytes=True)
                ) == data, (level, kind, n)
        data = _gen(rng, "text", 131073)  # crosses the block boundary
        assert zstd_decompress(codec.compress(data, asbytes=True)) == data


def test_xxh64_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") != xxh64(b"b")
    # 64-byte input exercises the 4-lane loop + merge rounds
    assert isinstance(xxh64(bytes(range(64))), int)


def test_multiframe_skippable_and_checksum():
    c = pa.Codec("zstd", compression_level=3)
    a = c.compress(b"alpha" * 100, asbytes=True)
    b = c.compress(b"beta" * 77, asbytes=True)
    skip = struct.pack("<II", 0x184D2A50, 5) + b"xxxxx"
    assert zstd_decompress(a + skip + b) == b"alpha" * 100 + b"beta" * 77
    fr = bytearray(c.compress(b"checksum me" * 50, asbytes=True))
    fr[4] |= 0x04  # set content-checksum flag
    fr += struct.pack("<I", xxh64(b"checksum me" * 50) & 0xFFFFFFFF)
    assert zstd_decompress(bytes(fr)) == b"checksum me" * 50
    bad = bytearray(fr)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(bad))


def test_refusals():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x01\x02\x03rest")
    c = pa.Codec("zstd", compression_level=1)
    good = c.compress(b"hello world " * 20, asbytes=True)
    with pytest.raises(ValueError):
        zstd_decompress(good[: len(good) // 2])
    # frame content size lie: flip the declared-size byte
    fhd = good[4]
    assert fhd & 0x20  # single-segment with 1-byte FCS
    bad = bytearray(good)
    bad[5] ^= 0x01
    with pytest.raises(ValueError):
        zstd_decompress(bytes(bad))


def test_truncated_skippable_frame_quarantines():
    with pytest.raises(ValueError, match="truncated skippable"):
        zstd_decompress(struct.pack("<I", 0x184D2A50))
    with pytest.raises(ValueError, match="skippable frame overruns"):
        zstd_decompress(struct.pack("<II", 0x184D2A50, 100) + b"short")


def test_truncated_header_fields_quarantine():
    # single-segment + 1-byte FCS, cut right before the FCS byte
    with pytest.raises(ValueError, match="truncated frame content size"):
        zstd_decompress(struct.pack("<I", 0xFD2FB528) + bytes([0x20]))


def test_raw_content_dictionary_decode():
    """A hand-built frame (RLE sequence tables) whose one sequence
    reaches 17 bytes into the supplied raw-content dictionary."""
    from shared_etl_pipelines_spark.sources.zstd_decode import (
        zstd_decompress,
    )

    dict_content = b"ABCDEFGHIJKLMNOPQRST"
    lits = b"wxyz"
    block = bytes([len(lits) << 3]) + lits  # raw literals, 1-byte header
    block += bytes([1])                     # n_seq = 1
    block += bytes([0x54])                  # ll/of/ml all RLE tables
    block += bytes([4, 4, 3])               # ll=4, of_code=4, ml code 3
    block += bytes([(1 << 4) | 8])          # back-bits: of extra = 8
    frame = struct.pack("<I", 0xFD2FB528)
    frame += bytes([0x21, 7, len(lits) + 6])  # FHD, dict id, FCS
    bh = 1 | (2 << 1) | (len(block) << 3)
    frame += bh.to_bytes(3, "little") + block
    # offset = (1<<4)+8-3 = 21: the match starts at dict byte 3
    assert zstd_decompress(frame, dict_content=dict_content) == (
        lits + dict_content[3:9]
    )
    with pytest.raises(ValueError, match="requires a dictionary"):
        zstd_decompress(frame)
    with pytest.raises(ValueError, match="formatted"):
        zstd_decompress(
            frame, dict_content=b"\x37\xa4\x30\xec" + b"x" * 40
        )


def test_dictless_frames_ignore_supplied_dictionary():
    # a normal reference-compressed frame must decode identically with
    # an (unused) raw dictionary supplied
    from shared_etl_pipelines_spark.sources.zstd_decode import (
        zstd_decompress,
    )

    data = b"corpus shard " * 400
    frame = pa.Codec("zstd").compress(data, asbytes=True)
    assert zstd_decompress(frame, dict_content=b"HISTORY" * 10) == data
