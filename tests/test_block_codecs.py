"""Snappy + LZ4 pure-Python codecs: cross-implementation property
sweeps against pyarrow's bundled reference C++, spec edge cases
(overlapping copies, linked blocks, length extensions), XXH32 vectors,
and refusal paths."""

import random
import struct

import pyarrow as pa
import pytest

from shared_etl_pipelines_spark.sources.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)
from shared_etl_pipelines_spark.sources.snappy import (
    snappy_compress,
    snappy_decompress,
)


def _cases(seed=7, n_random=60):
    rng = random.Random(seed)
    cases = [
        b"", b"a", b"hello hello hello hello", bytes(range(256)) * 16,
        b"ab" * 5000, b"x" * 100000, b"abcd" * 4, b"yz" * 200000,
    ]
    for _ in range(n_random):
        n = rng.randrange(0, 4000)
        alpha = rng.choice([b"ab", b"abcdefgh", bytes(range(256))])
        cases.append(bytes(rng.choice(alpha) for _ in range(n)))
    return cases


def test_snappy_cross_implementation_both_directions():
    for c in _cases():
        ref = pa.compress(c, codec="snappy", asbytes=True)
        assert snappy_decompress(ref) == c
        ours = snappy_compress(c)
        assert snappy_decompress(ours) == c
        assert (
            pa.decompress(ours, decompressed_size=len(c), codec="snappy",
                          asbytes=True) == c
        )


def test_lz4_cross_implementation_block_and_frame():
    for c in _cases(seed=11):
        assert lz4_block_decompress(
            pa.compress(c, codec="lz4_raw", asbytes=True), expected=len(c)
        ) == c
        ours = lz4_block_compress(c)
        assert (
            pa.decompress(ours, decompressed_size=len(c), codec="lz4_raw",
                          asbytes=True) == c
        )
        # frame path: pyarrow emits block-DEPENDENT frames on big inputs
        assert lz4_frame_decompress(
            pa.compress(c, codec="lz4", asbytes=True)
        ) == c
        ourf = lz4_frame_compress(c)
        assert (
            pa.decompress(ourf, decompressed_size=len(c), codec="lz4",
                          asbytes=True) == c
        )


def test_overlapping_copy_rle_idiom():
    # snappy: offset 1, length 4 > offset => forward-overlap run
    # (copy-1 tag stores len-4 in bits 2-4 and offset>>8 in bits 5-7)
    assert snappy_decompress(bytes([5, 0, ord("q"), 0x01, 1])) == b"qqqqq"
    # lz4: literal 'q' then match offset 1 len 8
    blk = bytes([0x14, ord("q"), 1, 0])
    assert lz4_block_decompress(blk) == b"q" * 9


def test_xxh32_vectors():
    assert xxh32(b"") == 0x02CC5D05
    # pinned against the reference via a frame content checksum:
    data = b"The quick brown fox jumps over the lazy dog"
    fr = pa.compress(data, codec="lz4", asbytes=True)
    # our decoder VERIFIES the reference-written checksums end to end
    assert lz4_frame_decompress(fr) == data
    assert xxh32(data, seed=1) != xxh32(data)


def test_refusals():
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([4, 0x0D, 5, 0]))  # copy before any output
    with pytest.raises(ValueError, match="declared"):
        snappy_decompress(bytes([9, (3 - 1) << 2]) + b"abc")
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00rest")
    good = lz4_frame_compress(b"hello world")
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # flip the content checksum
    with pytest.raises(ValueError, match="checksum"):
        lz4_frame_decompress(bytes(bad))
    with pytest.raises(ValueError, match="header checksum"):
        hdr = bytearray(good)
        hdr[6] ^= 0xFF
        lz4_frame_decompress(bytes(hdr))


def test_snappy_expansion_stops_at_declared_size():
    # declared 1 byte, but a 2-byte literal lands first: the decoder
    # must fail as soon as output exceeds the declaration, not after
    # materializing an attacker-controlled blow-up
    stream = bytes([1, (2 - 1) << 2]) + b"ab" + bytes([(1 - 1) << 2]) + b"c"
    with pytest.raises(ValueError, match="exceeds declared"):
        snappy_decompress(stream)


def test_lz4_truncated_block_checksum_quarantines():
    # hand-built frame with the block-checksum flag, cut at the checksum
    flg, bd = 0x70, 0x40  # v1 | indep | block-checksum; 64 KiB blocks
    hc = (xxh32(bytes([flg, bd])) >> 8) & 0xFF
    block = b"hi"
    frame = (
        struct.pack("<I", 0x184D2204)
        + bytes([flg, bd, hc])
        + struct.pack("<I", 0x80000000 | len(block))
        + block
        # 4-byte block checksum belongs here — truncated
    )
    with pytest.raises(ValueError, match="truncated block checksum"):
        lz4_frame_decompress(frame)
