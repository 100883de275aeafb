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
