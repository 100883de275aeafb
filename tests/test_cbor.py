"""CBOR decoding (sources/cbor.py) against RFC 8949 appendix-A vectors."""
import math

import pytest

from shared_etl_pipelines_spark.sources import cbor as C


@pytest.mark.parametrize(
    "v",
    [0, 23, 24, 255, 65536, 2 ** 40, -1, -25, -(2 ** 33), True, False,
     None, 1.5, -0.0078125, b"", b"\x01\x02", "", "héllo",
     [1, [2, "x"], b"y"], {"a": 1, "b": {"c": [True]}},
     ("tag", 1, 1700000000)],
)
def test_roundtrip(v):
    assert C.decode_cbor(C.encode_cbor(v)) == v


@pytest.mark.parametrize(
    "hx,want",
    [
        ("00", 0), ("17", 23), ("1818", 24), ("190100", 256),
        ("1a000f4240", 1000000), ("20", -1), ("3863", -100),
        ("f90000", 0.0), ("f93c00", 1.0), ("f93e00", 1.5),
        ("f97bff", 65504.0), ("f90001", 5.960464477539063e-8),
        ("f9c400", -4.0), ("fa47c35000", 100000.0),
        ("fb3ff199999999999a", 1.1),
        ("f4", False), ("f5", True), ("f6", None),
        ("63e6b0b4", "水"), ("83010203", [1, 2, 3]),
        ("5f42010243030405ff", b"\x01\x02\x03\x04\x05"),
        ("7f657374726561646d696e67ff", "streaming"),
        ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
        ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
        ("c249010000000000000000", 18446744073709551616),
        ("c349010000000000000000", -18446744073709551617),
    ],
)
def test_rfc_appendix_a_vectors(hx, want):
    assert C.decode_cbor(bytes.fromhex(hx)) == want


def test_half_precision_special_values():
    assert C.decode_cbor(bytes.fromhex("f97c00")) == float("inf")
    assert C.decode_cbor(bytes.fromhex("f9fc00")) == float("-inf")
    assert math.isnan(C.decode_cbor(bytes.fromhex("f97e00")))


@pytest.mark.parametrize(
    "hx",
    [
        "ff",            # break outside indefinite
        "5f00ff",        # mixed-type chunk in indefinite string
        "1c",            # reserved additional info
        "a16161",        # truncated map
        "8101ff",        # trailing bytes
        "fb00",          # truncated float64
        "a201020304",    # non-string map keys
        "a2616101616102",  # duplicate key
        "62fffe",        # invalid UTF-8 text
    ],
)
def test_refusals(hx):
    with pytest.raises(ValueError):
        C.decode_cbor(bytes.fromhex(hx))


def test_nesting_cap():
    blob = b"\x81" * 80 + b"\x00"
    with pytest.raises(ValueError):
        C.decode_cbor(blob)
