"""Thrift compact protocol decoder — pure Python, the PUBLIC protocol
spec (thrift.apache.org compact-protocol docs; the wire format behind
every parquet footer).

Generic: decodes a compact-protocol STRUCT to
``{field_id: (type_name, value)}`` with nested structs/lists decoded
recursively — the caller (sources/parquet_footer.py) maps field ids to
the parquet.thrift IDL. Supported wire types: the booleans folded into
field headers, i8/i16/i32/i64 (zigzag varints), binary/string, list,
struct; set decodes as list. Map and double refuse loudly (the parquet
footer never carries them, and a silently-misparsed footer is worse
than a quarantine).
"""

from __future__ import annotations

__all__ = ["decode_struct"]

_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_I8 = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12


def _uvarint(buf: bytes, p: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if p >= len(buf):
            raise ValueError("thrift: truncated varint")
        b = buf[p]
        v |= (b & 0x7F) << shift
        p += 1
        if not b & 0x80:
            return v, p
        shift += 7
        if shift > 70:
            raise ValueError("thrift: varint too long")


def _zigzag(buf: bytes, p: int) -> tuple[int, int]:
    u, p = _uvarint(buf, p)
    return (u >> 1) ^ -(u & 1), p


def _value(buf: bytes, p: int, wtype: int):
    if wtype in (_T_TRUE, _T_FALSE):
        # only reachable inside LISTS, where each bool element occupies
        # one byte (0x01 true / 0x02 false per the compact spec) —
        # struct-field bools fold into the header and are handled by
        # the caller
        if p >= len(buf):
            raise ValueError("thrift: truncated bool element")
        b = buf[p]
        if b not in (1, 2):
            raise ValueError("thrift: malformed bool element — quarantine")
        return b == 1, p + 1
    if wtype == _T_I8:
        if p >= len(buf):
            raise ValueError("thrift: truncated i8")
        v = buf[p]
        return v - 256 if v >= 128 else v, p + 1
    if wtype in (_T_I16, _T_I32, _T_I64):
        return _zigzag(buf, p)
    if wtype == _T_BINARY:
        n, p = _uvarint(buf, p)
        if p + n > len(buf):
            raise ValueError("thrift: truncated binary")
        return buf[p : p + n], p + n
    if wtype in (_T_LIST, _T_SET):
        if p >= len(buf):
            raise ValueError("thrift: truncated list header")
        head = buf[p]
        p += 1
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size, p = _uvarint(buf, p)
        if size > 10_000_000:
            raise ValueError("thrift: implausible list size — quarantine")
        out = []
        for _ in range(size):
            v, p = _value(buf, p, etype)
            out.append(v)
        return out, p
    if wtype == _T_STRUCT:
        return decode_struct(buf, p)
    raise ValueError(f"thrift: wire type {wtype} unsupported — quarantine")


def decode_struct(buf: bytes, p: int = 0) -> tuple[dict, int]:
    """One struct starting at ``p``: ``{field_id: value}`` (bools from
    folded headers become Python bools). Returns (fields, next_pos)."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        if p >= len(buf):
            raise ValueError("thrift: truncated struct (no STOP)")
        head = buf[p]
        p += 1
        if head == _T_STOP:
            return fields, p
        delta = head >> 4
        wtype = head & 0x0F
        if delta:
            fid = last_id + delta
        else:
            fid, p = _zigzag(buf, p)
        last_id = fid
        if wtype in (_T_TRUE, _T_FALSE):
            fields[fid] = wtype == _T_TRUE
        else:
            fields[fid], p = _value(buf, p, wtype)
