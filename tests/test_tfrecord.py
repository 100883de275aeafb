"""TFRecord framing + tf.train.Example decode (sources/tfrecord.py)."""
import struct

import pytest

from shared_etl_pipelines_spark.sources import tfrecord as T

FEATS = {
    "id": ("int64", [12345, -7]),
    "text": ("bytes", [b"hello", "wörld".encode()]),
    "score": ("float", [1.625, -0.5]),
    "empty": ("int64", []),
}


def test_crc32c_public_vectors():
    assert T.crc32c(b"") == 0
    assert T.crc32c(b"123456789") == 0xE3069283  # the canonical check value
    assert T.crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 B.4 vector


def test_example_roundtrip():
    out, unknown = T.parse_example(T.encode_example(FEATS))
    assert unknown == 0
    assert out["id"] == ("int64", [12345, -7])
    assert out["text"] == ("bytes", [b"hello", "wörld".encode()])
    assert out["score"] == ("float", [1.625, -0.5])
    assert out["empty"] == ("int64", [])


def test_framing_roundtrip_and_refusals():
    ex = T.encode_example(FEATS)
    blob = T.write_tfrecords([ex, ex, b"raw"])
    assert T.read_tfrecords(blob) == [ex, ex, b"raw"]
    bad = bytearray(blob)
    bad[14] ^= 0xFF  # payload byte
    with pytest.raises(ValueError):
        T.read_tfrecords(bytes(bad))
    hdr = bytearray(blob)
    hdr[2] ^= 0xFF  # length field
    with pytest.raises(ValueError):
        T.read_tfrecords(bytes(hdr))
    with pytest.raises(ValueError):
        T.read_tfrecords(blob[:-3])
    with pytest.raises(ValueError):
        T.read_tfrecords(blob[:5])


def test_unpacked_numeric_lists_also_parse():
    # real writers sometimes emit unpacked repeated scalars — accept
    body = T._tagged(
        3, T._varint((1 << 3) | 0) + T._varint(9)
        + T._varint((1 << 3) | 0) + T._varint(2)
    )
    entry = T._tagged(1, T._tagged(1, b"k") + T._tagged(2, body))
    ex = T._tagged(1, entry)
    feats, unknown = T.parse_example(ex)
    assert feats["k"] == ("int64", [9, 2]) and unknown == 0
    fbody = T._tagged(
        2,
        T._varint((1 << 3) | 5) + struct.pack("<f", 2.5)
    )
    entry = T._tagged(1, T._tagged(1, b"f") + T._tagged(2, fbody))
    feats, _ = T.parse_example(T._tagged(1, entry))
    assert feats["f"] == ("float", [2.5])


def test_unknown_fields_counted_not_fatal():
    ex = bytearray(T.encode_example({"id": ("int64", [1])}))
    # append an unknown top-level varint field 9
    ex += T._varint((9 << 3) | 0) + T._varint(5)
    feats, unknown = T.parse_example(bytes(ex))
    assert feats["id"] == ("int64", [1]) and unknown == 1


def test_example_refusals():
    with pytest.raises(ValueError):
        T.parse_example(b"\x00\x01")  # field number 0
    # map entry without key
    entry = T._tagged(1, T._tagged(2, T.encode_example({})))
    with pytest.raises(ValueError):
        T.parse_example(T._tagged(1, entry))
    # packed floats misaligned
    fbody = T._tagged(2, T._tagged(1, b"\x01\x02\x03"))
    entry = T._tagged(1, T._tagged(1, b"f") + T._tagged(2, fbody))
    with pytest.raises(ValueError):
        T.parse_example(T._tagged(1, entry))
