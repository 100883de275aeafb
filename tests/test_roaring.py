"""RoaringFormatSpec portable (de)serialization: canonical container
choice (array/bitmap/run), the run cookie's offset-header rule, and the
64-bit bucketed extension."""

import random
import struct

import pytest

from shared_etl_pipelines_spark.sources.roaring import (
    deserialize_roaring,
    deserialize_roaring64,
    serialize_roaring,
    serialize_roaring64,
)


def test_run_container_roundtrip_and_size():
    # a full 64 Ki container is one run: ~15 bytes, not an 8 KiB bitmap
    dense = set(range(1 << 16))
    blob = serialize_roaring(dense)
    assert len(blob) < 32
    assert struct.unpack_from("<H", blob, 0)[0] == 12347  # run cookie
    assert deserialize_roaring(blob) == sorted(dense)
    # takedown-style ranges across several containers
    vals = set(range(100_000, 165_000)) | set(range(7_000_000, 7_000_050))
    blob = serialize_roaring(vals)
    assert len(blob) < 200
    assert deserialize_roaring(blob) == sorted(vals)


def test_canonical_choice_prefers_smaller_encoding():
    # scattered values: array (2 bytes/value) beats runs (4 bytes/run)
    scattered = set(range(0, 2000, 2))  # 1000 runs of length 1
    blob = serialize_roaring(scattered)
    assert struct.unpack_from("<I", blob, 0)[0] == 12346  # no-run cookie
    assert deserialize_roaring(blob) == sorted(scattered)
    # mixed: one dense container (run) + one scattered (array) in a map
    mixed = set(range(1 << 16)) | {(1 << 16) + v for v in range(0, 999, 3)}
    blob = serialize_roaring(mixed)
    assert struct.unpack_from("<H", blob, 0)[0] == 12347
    assert deserialize_roaring(blob) == sorted(mixed)


def test_run_cookie_offset_header_threshold():
    # < 4 containers with the run cookie: offsets omitted
    small = set(range(1 << 16)) | {1 << 17}
    assert deserialize_roaring(serialize_roaring(small)) == sorted(small)
    # >= 4 containers, at least one run: offsets present
    big = set()
    for c in range(5):
        big |= set(range(c << 16, (c << 16) + (70_000 if c == 0 else 10)))
    big = {v & 0xFFFFFFFF for v in big if v < 1 << 32}
    blob = serialize_roaring(big)
    assert struct.unpack_from("<H", blob, 0)[0] == 12347
    assert deserialize_roaring(blob) == sorted(big)


def test_fuzz_roundtrip_32():
    rng = random.Random(12)
    for _ in range(20):
        vals = {rng.randrange(1 << 32) for _ in range(rng.randrange(0, 500))}
        if rng.random() < 0.5 and vals:
            lo = min(vals)
            vals |= set(range(lo, lo + rng.randrange(1, 9000)))
        vals = {v for v in vals if v < 1 << 32}
        assert deserialize_roaring(serialize_roaring(vals)) == sorted(vals)


def test_64bit_roundtrip_and_buckets():
    vals = {3, (5 << 32) + 7, (5 << 32) + 8} | {
        (1 << 40) + i for i in range(100)
    }
    blob = serialize_roaring64(vals)
    (n_buckets,) = struct.unpack_from("<Q", blob, 0)
    assert n_buckets == 3  # high-32 buckets 0, 5, 256
    assert deserialize_roaring64(blob) == sorted(vals)
    assert deserialize_roaring64(serialize_roaring64(set())) == []


def test_64bit_fuzz_with_runs():
    rng = random.Random(34)
    for _ in range(10):
        vals = {rng.randrange(1 << 48) for _ in range(200)}
        base = rng.randrange(1 << 40)
        vals |= set(range(base, base + 70_000))  # spans containers
        assert deserialize_roaring64(serialize_roaring64(vals)) == sorted(vals)


def test_refusals():
    with pytest.raises(ValueError, match="uint32"):
        serialize_roaring({1 << 32})
    with pytest.raises(ValueError, match="uint64"):
        serialize_roaring64({1 << 64})
    with pytest.raises(ValueError, match="truncated"):
        deserialize_roaring(b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        deserialize_roaring64(b"\x00\x01")
    with pytest.raises(ValueError, match="overruns"):
        deserialize_roaring64(struct.pack("<Q", 99) + b"\x00" * 8)
    good = serialize_roaring64({1, 2, 3})
    with pytest.raises(ValueError, match="trailing"):
        deserialize_roaring64(good + b"\x00")
    # truncated nested map inside a 64-bit bucket
    with pytest.raises(ValueError):
        deserialize_roaring64(good[:-2])
