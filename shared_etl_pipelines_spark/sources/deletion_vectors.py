"""Delta Lake deletion vectors (the PUBLIC delta.io PROTOCOL.md
"Deletion Vectors" section).

A DV marks rows of one data file as deleted without rewriting the
file. The add action's descriptor is
``{storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}``:

- storageType "i": pathOrInlineDv IS the serialized bitmap, Z85-encoded
  (the ZeroMQ base-85 alphabet — spec 32/Z85), no file involved;
- storageType "p": pathOrInlineDv is an absolute path to a DV file;
- storageType "u": pathOrInlineDv is ``[<prefix>/]<z85 of a 16-byte
  uuid>``; the file lives at
  ``<table>/[<prefix>/]deletion_vector_<uuid>.bin``.

DV file layout: a 1-byte format version (1), then each stored vector
at its ``offset``: a 4-byte big-endian size, ``size`` bytes of payload,
and a 4-byte big-endian CRC-32 of the payload. The payload is a
"RoaringBitmapArray" in the portable format: 4-byte little-endian
magic 1681511377, an 8-byte little-endian bitmap count, then each
32-bit roaring bitmap (sources/roaring.py) — bitmap j holds the low 32
bits of row indexes in [j*2^32, (j+1)*2^32).

Malformed anything (bad magic, CRC mismatch, cardinality lies) refuses
with ValueError — a deletion vector that cannot be trusted must
quarantine the FILE, never silently under-delete.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

from shared_etl_pipelines_spark.sources.roaring import (
    deserialize_roaring,
    serialize_roaring,
)

__all__ = [
    "z85_encode", "z85_decode",
    "serialize_dv", "deserialize_dv",
    "write_dv_file", "read_dv_descriptor",
]

_MAGIC = 1681511377
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = struct.unpack(">I", data[i : i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise ValueError(f"z85: bad character {c!r}")
            v = v * 85 + _Z85_INDEX[c]
        if v > 0xFFFFFFFF:
            raise ValueError("z85: group overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


def serialize_dv(positions: list[int] | set[int]) -> bytes:
    """RoaringBitmapArray payload for a set of row indexes (>= 0)."""
    pos = sorted(set(positions))
    if pos and pos[0] < 0:
        raise ValueError("dv: negative row index")
    by_high: dict[int, list[int]] = {}
    for p in pos:
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = [struct.pack("<IQ", _MAGIC, n)]
    for j in range(n):
        out.append(serialize_roaring(by_high.get(j, [])))
    return b"".join(out)


def deserialize_dv(payload: bytes, cardinality: int | None = None) -> list[int]:
    """Row indexes out of a RoaringBitmapArray payload; verifies the
    descriptor's cardinality when given."""
    if len(payload) < 12:
        raise ValueError("dv: truncated payload")
    magic, n = struct.unpack_from("<IQ", payload, 0)
    if magic != _MAGIC:
        raise ValueError(f"dv: bad magic {magic}")
    p = 12
    out: list[int] = []
    for j in range(n):
        # each bitmap is self-delimiting; decode then advance by its
        # re-serialized length (canonical writer => identical bytes;
        # foreign writers may differ, so re-measure structurally)
        vals = deserialize_roaring(payload[p:])
        p += _measure_roaring(payload[p:])
        out.extend((j << 32) + v for v in vals)
    if p != len(payload):
        raise ValueError("dv: trailing bytes after last bitmap")
    if cardinality is not None and len(out) != cardinality:
        raise ValueError(
            f"dv: cardinality mismatch ({len(out)} != {cardinality})"
        )
    return out


def _measure_roaring(blob: bytes) -> int:
    """Byte length of the leading portable roaring bitmap in ``blob``."""
    cookie16 = struct.unpack_from("<H", blob, 0)[0]
    if cookie16 == 12347:
        n = struct.unpack_from("<H", blob, 2)[0] + 1
        p = 4 + (n + 7) // 8
        has_run = True
        run_flags = blob[4 : 4 + (n + 7) // 8]
    else:
        n = struct.unpack_from("<I", blob, 4)[0]
        p = 8
        has_run = False
        run_flags = b""
    cards = []
    for i in range(n):
        cards.append(struct.unpack_from("<HH", blob, p + 4 * i)[1] + 1)
    p += 4 * n
    if not has_run or n >= 4:
        p += 4 * n
    for i, card in enumerate(cards):
        if has_run and run_flags[i >> 3] & (1 << (i & 7)):
            n_runs = struct.unpack_from("<H", blob, p)[0]
            p += 2 + 4 * n_runs
        elif card <= 4096:
            p += 2 * card
        else:
            p += 8192
    return p


def write_dv_file(path: str, dvs: list[list[int]]) -> list[tuple[int, int]]:
    """Write a version-1 DV file holding one stored vector per entry of
    ``dvs``; returns (offset, sizeInBytes) per vector for descriptors."""
    spans = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        off = 1
        for positions in dvs:
            payload = serialize_dv(positions)
            fh.write(struct.pack(">I", len(payload)))
            fh.write(payload)
            fh.write(struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))
            spans.append((off, len(payload)))
            off += 4 + len(payload) + 4
    return spans


def read_dv_descriptor(table_path: str, desc: dict) -> list[int]:
    """Resolve one add-action deletionVector descriptor to row indexes.
    Pure function of (table root, descriptor) — executors call it."""
    import os

    st = desc["storageType"]
    if st == "i":
        payload = z85_decode(desc["pathOrInlineDv"])
        if len(payload) < desc["sizeInBytes"]:
            raise ValueError("dv: inline payload shorter than sizeInBytes")
        return deserialize_dv(
            payload[: desc["sizeInBytes"]], desc.get("cardinality")
        )
    if st == "p":
        fpath = desc["pathOrInlineDv"]
    elif st == "u":
        enc = desc["pathOrInlineDv"]
        # the UUID is always the LAST 20 z85 chars; everything before is
        # the random path prefix. Splitting on "/" would be wrong: "/"
        # is itself a z85 alphabet character and can appear INSIDE the
        # encoded uuid.
        if len(enc) < 20:
            raise ValueError("dv: uuid storage shorter than a z85 uuid")
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(tail))
        fpath = os.path.join(
            table_path, *( [prefix] if prefix else [] ),
            f"deletion_vector_{u}.bin",
        )
    else:
        raise ValueError(f"dv: unknown storageType {st!r}")
    with open(fpath, "rb") as fh:
        head = fh.read(1)
        if head != b"\x01":
            raise ValueError("dv: unsupported DV file version")
        fh.seek(desc["offset"])
        size = struct.unpack(">I", fh.read(4))[0]
        if size != desc["sizeInBytes"]:
            raise ValueError("dv: stored size != descriptor sizeInBytes")
        payload = fh.read(size)
        crc = struct.unpack(">I", fh.read(4))[0]
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("dv: CRC mismatch — quarantine")
    return deserialize_dv(payload, desc.get("cardinality"))
