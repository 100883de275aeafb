"""Snappy block format — pure Python, the PUBLIC format description
(github.com/google/snappy format_description.txt).

Snappy is parquet's default page codec and ubiquitous in warehouse
dumps; this decoder/encoder pair means the engine can open snappy
payloads without a C extension, and — because pyarrow bundles the
reference C++ implementation — every test cross-checks against an
INDEPENDENT implementation in both directions (our decode of pyarrow's
bytes, pyarrow's decode of ours).

Format: a varint uncompressed length, then tagged elements —
  tag & 3 == 0: literal; length-1 in the upper 6 bits, values 60-63
                mean the length is in the next 1-4 little-endian bytes;
  tag & 3 == 1: copy, 1-byte offset: len = ((tag>>2) & 7) + 4,
                offset = ((tag>>5) << 8) | next byte (4-11 byte runs);
  tag & 3 == 2: copy, 2-byte LE offset: len = (tag>>2) + 1;
  tag & 3 == 3: copy, 4-byte LE offset: len = (tag>>2) + 1.
Copies may overlap forward (offset < length) — the RLE idiom — and the
decoder must materialize them byte-by-byte in that case.

Truncated input, zero/backward-invalid offsets, or output size
mismatch refuse with ValueError.
"""

from __future__ import annotations

__all__ = ["snappy_decompress", "snappy_compress"]

_MAX_OUTPUT = 1 << 30


def _uvarint(buf: bytes, p: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if p >= len(buf):
            raise ValueError("snappy: truncated length varint")
        b = buf[p]
        v |= (b & 0x7F) << shift
        p += 1
        if not b & 0x80:
            return v, p
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def snappy_decompress(buf: bytes) -> bytes:
    n, p = _uvarint(buf, 0)
    if n > _MAX_OUTPUT:
        raise ValueError("snappy: declared output too large — quarantine")
    out = bytearray()
    while p < len(buf):
        # a valid stream can never exceed its declared size, and copies
        # expand up to ~32x the input — fail BEFORE allocating the blow-up
        if len(out) > n:
            raise ValueError(
                f"snappy: output exceeds declared {n} — quarantine"
            )
        tag = buf[p]
        p += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if p + nb > len(buf):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(buf[p : p + nb], "little")
                p += nb
            ln += 1
            if p + ln > len(buf):
                raise ValueError("snappy: literal overruns input")
            out += buf[p : p + ln]
            p += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            if p >= len(buf):
                raise ValueError("snappy: truncated copy-1")
            off = ((tag >> 5) << 8) | buf[p]
            p += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            if p + 2 > len(buf):
                raise ValueError("snappy: truncated copy-2")
            off = int.from_bytes(buf[p : p + 2], "little")
            p += 2
        else:
            ln = (tag >> 2) + 1
            if p + 4 > len(buf):
                raise ValueError("snappy: truncated copy-4")
            off = int.from_bytes(buf[p : p + 4], "little")
            p += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: invalid copy offset — quarantine")
        if off >= ln:
            start = len(out) - off
            out += out[start : start + ln]
        else:  # overlapping copy: byte-by-byte per spec
            start = len(out) - off
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError(
            f"snappy: output {len(out)} != declared {n} — quarantine"
        )
    return bytes(out)


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-table compressor: valid snappy output (2-byte-offset
    copies + literals), not byte-identical to the reference encoder —
    the cross-check is that the reference DECODER accepts it."""
    out = bytearray(_enc_uvarint(len(data)))
    n = len(data)
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0

    def emit_literal(lo: int, hi: int) -> None:
        ln = hi - lo
        while ln > 0:
            chunk = min(ln, 60)
            out.append((chunk - 1) << 2)
            out.extend(data[lo : lo + chunk])
            lo += chunk
            ln -= chunk

    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            # extend the match
            m = 4
            while i + m < n and data[cand + m] == data[i + m] and m < 64:
                m += 1
            emit_literal(lit_start, i)
            off = i - cand
            out.append(((m - 1) << 2) | 2)
            out += off.to_bytes(2, "little")
            i += m
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)
