"""TFRecord + tf.train.Example parsing — pure Python, public specs.

TFRecord is the de-facto training-example container in large ML
pipelines (TensorFlow's riegeli-predecessor framing), and its payloads
are almost always ``tf.train.Example`` protobuf messages. An
LLM-training data engine meets these files constantly; this module
implements both layers from the public specifications with REAL
integrity verification:

- TFRecord framing: ``uint64 length | masked crc32c(length) | payload
  | masked crc32c(payload)`` — CRC32C (Castagnoli) computed with a
  software table, the mask being ``((crc >> 15) | (crc << 17)) +
  0xa282ead8``. A failed CRC or truncated frame refuses loudly —
  torn shards must quarantine, not truncate silently.
- Protobuf wire format: varints, 64-bit/32-bit fixed, length-delimited
  — enough to decode ``Example { Features { map<string, Feature> } }``
  where ``Feature`` is one of BytesList / FloatList (packed or
  unpacked floats) / Int64List (packed or unpacked varints). Unknown
  fields are SKIPPED per protobuf rules but COUNTED, so schema drift
  is visible instead of silent.

Writers exist for fixtures/roundtrips and emit canonical packed lists.
"""
from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "read_tfrecords",
    "write_tfrecords",
    "parse_example",
    "encode_example",
]

# software CRC32C (Castagnoli, reflected poly 0x82F63B78)
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ----------------------------------------------------------------------
# TFRecord framing
# ----------------------------------------------------------------------
def read_tfrecords(blob: bytes) -> list[bytes]:
    """Walk every frame, verifying BOTH masked CRCs. Returns payloads."""
    out: list[bytes] = []
    pos = 0
    while pos < len(blob):
        if pos + 12 > len(blob):
            raise ValueError("tfrecord: truncated frame header — quarantine")
        (length,) = struct.unpack_from("<Q", blob, pos)
        (len_crc,) = struct.unpack_from("<I", blob, pos + 8)
        if len_crc != _masked(crc32c(blob[pos : pos + 8])):
            raise ValueError("tfrecord: length CRC mismatch — quarantine")
        body = pos + 12
        if body + length + 4 > len(blob):
            raise ValueError("tfrecord: truncated payload — quarantine")
        payload = blob[body : body + length]
        (data_crc,) = struct.unpack_from("<I", blob, body + length)
        if data_crc != _masked(crc32c(payload)):
            raise ValueError("tfrecord: payload CRC mismatch — quarantine")
        out.append(payload)
        pos = body + length + 4
    return out


def write_tfrecords(payloads: list[bytes]) -> bytes:
    out = bytearray()
    for p in payloads:
        hdr = struct.pack("<Q", len(p))
        out += hdr
        out += struct.pack("<I", _masked(crc32c(hdr)))
        out += p
        out += struct.pack("<I", _masked(crc32c(p)))
    return bytes(out)


# ----------------------------------------------------------------------
# protobuf wire format (the Example subset)
# ----------------------------------------------------------------------
def _varint_read(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("protobuf: truncated varint — quarantine")
        b = data[pos]
        acc |= (b & 0x7F) << shift
        pos += 1
        if not (b & 0x80):
            return acc, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint over 10 bytes — quarantine")


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _fields(data: bytes):
    """Iterate (field_no, wire_type, value) over one message.
    value: int for varint/fixed, bytes for length-delimited."""
    pos = 0
    while pos < len(data):
        tag, pos = _varint_read(data, pos)
        fno, wt = tag >> 3, tag & 7
        if fno == 0:
            raise ValueError("protobuf: field number 0 — quarantine")
        if wt == 0:
            v, pos = _varint_read(data, pos)
        elif wt == 1:
            if pos + 8 > len(data):
                raise ValueError("protobuf: truncated fixed64 — quarantine")
            v = struct.unpack_from("<Q", data, pos)[0]
            pos += 8
        elif wt == 2:
            n, pos = _varint_read(data, pos)
            if pos + n > len(data):
                raise ValueError(
                    "protobuf: length-delimited overrun — quarantine"
                )
            v = data[pos : pos + n]
            pos += n
        elif wt == 5:
            if pos + 4 > len(data):
                raise ValueError("protobuf: truncated fixed32 — quarantine")
            v = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        else:
            raise ValueError(f"protobuf: wire type {wt} reserved — quarantine")
        yield fno, wt, v


def _to_sint64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _parse_list(body: bytes, kind: str) -> list:
    vals: list = []
    for fno, wt, v in _fields(body):
        if fno != 1:
            continue  # unknown field inside a *List — skip per proto rules
        if kind == "bytes":
            if wt != 2:
                raise ValueError("Example: BytesList value not bytes")
            vals.append(v)
        elif kind == "float":
            if wt == 5:
                vals.append(struct.unpack("<f", struct.pack("<I", v))[0])
            elif wt == 2:  # packed
                if len(v) % 4:
                    raise ValueError("Example: packed floats misaligned")
                vals.extend(
                    struct.unpack(f"<{len(v) // 4}f", v) if v else ()
                )
            else:
                raise ValueError("Example: FloatList bad wire type")
        else:  # int64
            if wt == 0:
                vals.append(_to_sint64(v))
            elif wt == 2:  # packed varints
                pos = 0
                while pos < len(v):
                    u, pos = _varint_read(v, pos)
                    vals.append(_to_sint64(u))
            else:
                raise ValueError("Example: Int64List bad wire type")
    return vals


def parse_example(payload: bytes) -> tuple[dict, int]:
    """tf.train.Example -> ({name: (kind, values)}, n_unknown_fields).
    kind in {'bytes','float','int64'}; unknown fields at any level are
    skipped per protobuf rules but counted."""
    features: dict[str, tuple[str, list]] = {}
    unknown = 0
    feats_msgs = []
    for fno, wt, v in _fields(payload):
        if fno == 1 and wt == 2:
            feats_msgs.append(v)
        else:
            unknown += 1
    for fm in feats_msgs:
        for fno, wt, v in _fields(fm):
            if fno != 1 or wt != 2:
                unknown += 1
                continue
            key = None
            feature = b""
            for efno, ewt, ev in _fields(v):  # map entry
                if efno == 1 and ewt == 2:
                    key = ev.decode("utf-8", "strict")
                elif efno == 2 and ewt == 2:
                    feature = ev
                else:
                    unknown += 1
            if key is None:
                raise ValueError("Example: map entry without key — quarantine")
            kind, vals = None, []
            for ffno, fwt, fv in _fields(feature):
                if fwt != 2:
                    unknown += 1
                    continue
                if ffno == 1:
                    kind, vals = "bytes", _parse_list(fv, "bytes")
                elif ffno == 2:
                    kind, vals = "float", _parse_list(fv, "float")
                elif ffno == 3:
                    kind, vals = "int64", _parse_list(fv, "int64")
                else:
                    unknown += 1
            if kind is None:
                raise ValueError(
                    f"Example: feature {key!r} with no list — quarantine"
                )
            features[key] = (kind, vals)
    return features, unknown


def _tagged(fno: int, body: bytes) -> bytes:
    return _varint((fno << 3) | 2) + _varint(len(body)) + body


def encode_example(features: dict[str, tuple[str, list]]) -> bytes:
    """{name: (kind, values)} -> canonical Example bytes (packed
    numeric lists, map entries in insertion order)."""
    entries = b""
    for key, (kind, vals) in features.items():
        if kind == "bytes":
            body = b"".join(_tagged(1, v) for v in vals)
            feat = _tagged(1, body)
        elif kind == "float":
            packed = struct.pack(f"<{len(vals)}f", *vals)
            feat = _tagged(2, _tagged(1, packed) if vals else b"")
        elif kind == "int64":
            packed = b"".join(
                _varint(v & 0xFFFFFFFFFFFFFFFF) for v in vals
            )
            feat = _tagged(3, _tagged(1, packed) if vals else b"")
        else:
            raise ValueError(f"Example: unknown feature kind {kind!r}")
        entries += _tagged(
            1, _tagged(1, key.encode("utf-8")) + _tagged(2, feat)
        )
    return _tagged(1, entries)


def ensure_demo_tfrecords(sf_dir: str, shard_size: int = 64) -> str:
    """Write (idempotently) the TFRecord twin of ``documents``: one
    Example per doc with ``id`` (int64), ``text`` (bytes), ``score``
    (float, (d%50)/4 exact in f32) and ``tags`` (int64 x d%3);
    doc_id % 43 == 0 examples carry an EXTRA ``note`` feature — the
    schema-drift class an audit must surface. Shards of ``shard_size``
    docs; returns the shard directory."""
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    digest = hashlib.md5(
        repr((len(docs), docs[:2], shard_size)).encode()
    ).hexdigest()[:12]
    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_tfr_demo_v1", f"docs-{digest}"
    )
    done = root + ".done"
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    for s in range(0, len(docs), shard_size):
        payloads = []
        for d, text in docs[s : s + shard_size]:
            data = str(text).encode("utf-8")
            feats = {
                "id": ("int64", [d]),
                "text": ("bytes", [data]),
                "score": ("float", [(d % 50) / 4]),
                "tags": ("int64", [(d + j) % 100 for j in range(d % 3)]),
            }
            if d % 43 == 0:
                feats["note"] = ("bytes", [b"drifted"])
            payloads.append(encode_example(feats))
        shard = os.path.join(root, f"part-{s // shard_size:05d}.tfrecord")
        tmp = shard + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(write_tfrecords(payloads))
        os.replace(tmp, shard)
    with open(done, "w") as fh:
        fh.write("ok")
    return root
