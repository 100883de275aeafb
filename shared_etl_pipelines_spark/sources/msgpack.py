"""MessagePack decoding — the fluentd/fluent-bit log-transport format.

Log pipelines ship events as MessagePack (fluentd's forward protocol
frames are msgpack arrays ``[tag, time, record]``); an ETL engine
ingesting machine logs at scale meets these streams before anything
JSON. Pure-Python decoder/encoder for the public spec
(msgpack.org format spec, 2013 revision):

- nil/bool, positive/negative fixint, (u)int 8-64, float 32/64
- fixstr/str8/16/32 (strict UTF-8), bin 8/16/32
- fixarray/array16/32, fixmap/map16/32 (string keys only here — log
  records; non-string keys refuse loudly)
- ext types and the reserved 0xc1 byte refuse by name — never guessed.

``decode_stream`` walks back-to-back objects (the transport framing),
refusing trailing garbage and truncation.
"""
from __future__ import annotations

import struct

__all__ = ["decode_msgpack", "decode_stream", "encode_msgpack"]


def _decode(b: bytes, pos: int, depth: int = 0):
    # Depth cap matches cbor.py/bencode.py: 3000 nested fixarray headers
    # (0x91...) would otherwise raise RecursionError, which escapes the
    # except-ValueError quarantine wrapper and kills the executor task.
    if depth > 64:
        raise ValueError("msgpack: nesting depth > 64 — quarantine")
    if pos >= len(b):
        raise ValueError("msgpack: truncated — quarantine")
    t = b[pos]
    pos += 1
    if t <= 0x7F:  # positive fixint
        return t, pos
    if t >= 0xE0:  # negative fixint
        return t - 256, pos
    if 0x80 <= t <= 0x8F:
        return _map(b, pos, t & 0x0F, depth)
    if 0x90 <= t <= 0x9F:
        return _array(b, pos, t & 0x0F, depth)
    if 0xA0 <= t <= 0xBF:
        return _str(b, pos, t & 0x1F)
    if t == 0xC0:
        return None, pos
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t == 0xC1:
        raise ValueError("msgpack: reserved byte 0xc1 — quarantine")
    if t in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _len(b, pos, (1, 2, 4)[t - 0xC4])
        return _take(b, pos, n)
    if t in (0xC7, 0xC8, 0xC9, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8):
        raise ValueError("msgpack: ext types unsupported — quarantine")
    if t == 0xCA:
        v = _take(b, pos, 4)
        return struct.unpack(">f", v[0])[0], v[1]
    if t == 0xCB:
        v = _take(b, pos, 8)
        return struct.unpack(">d", v[0])[0], v[1]
    if t in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        n = 1 << (t - 0xCC)
        v = _take(b, pos, n)
        return int.from_bytes(v[0], "big"), v[1]
    if t in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        n = 1 << (t - 0xD0)
        v = _take(b, pos, n)
        return int.from_bytes(v[0], "big", signed=True), v[1]
    if t in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _len(b, pos, (1, 2, 4)[t - 0xD9])
        return _str_n(b, pos, n)
    if t in (0xDC, 0xDD):  # array 16/32
        n, pos = _len(b, pos, (2, 4)[t - 0xDC])
        return _array(b, pos, n, depth)
    if t in (0xDE, 0xDF):  # map 16/32
        n, pos = _len(b, pos, (2, 4)[t - 0xDE])
        return _map(b, pos, n, depth)
    raise ValueError(f"msgpack: unknown type byte {t:#x} — quarantine")


def _take(b: bytes, pos: int, n: int) -> tuple[bytes, int]:
    if pos + n > len(b):
        raise ValueError("msgpack: truncated payload — quarantine")
    return b[pos : pos + n], pos + n


def _len(b: bytes, pos: int, width: int) -> tuple[int, int]:
    raw, pos = _take(b, pos, width)
    return int.from_bytes(raw, "big"), pos


def _str(b: bytes, pos: int, n: int):
    return _str_n(b, pos, n)


def _str_n(b: bytes, pos: int, n: int):
    raw, pos = _take(b, pos, n)
    try:
        return raw.decode("utf-8", "strict"), pos
    except UnicodeDecodeError as e:
        raise ValueError(f"msgpack: invalid UTF-8 str — quarantine ({e})") from e


def _array(b: bytes, pos: int, n: int, depth: int = 0):
    out = []
    for _ in range(n):
        v, pos = _decode(b, pos, depth + 1)
        out.append(v)
    return out, pos


def _map(b: bytes, pos: int, n: int, depth: int = 0):
    out = {}
    for _ in range(n):
        k, pos = _decode(b, pos, depth + 1)
        if not isinstance(k, str):
            raise ValueError("msgpack: non-string map key — quarantine")
        v, pos = _decode(b, pos, depth + 1)
        out[k] = v
    return out, pos


def decode_msgpack(b: bytes):
    v, pos = _decode(b, 0)
    if pos != len(b):
        raise ValueError("msgpack: trailing bytes — quarantine")
    return v


def decode_stream(b: bytes) -> list:
    """Back-to-back objects (the fluentd transport framing)."""
    out = []
    pos = 0
    while pos < len(b):
        v, pos = _decode(b, pos)
        out.append(v)
    return out


def encode_msgpack(v) -> bytes:
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, n in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < 1 << (8 * n):
                    return bytes([code]) + v.to_bytes(n, "big")
            raise ValueError("msgpack: uint over 64 bits")
        for code, n in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * n - 1)) <= v:
                return bytes([code]) + v.to_bytes(n, "big", signed=True)
        raise ValueError("msgpack: int under 64 bits")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        if len(raw) <= 31:
            return bytes([0xA0 | len(raw)]) + raw
        for code, n in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if len(raw) < 1 << (8 * n):
                return bytes([code]) + len(raw).to_bytes(n, "big") + raw
    if isinstance(v, bytes):
        for code, n in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if len(v) < 1 << (8 * n):
                return bytes([code]) + len(v).to_bytes(n, "big") + v
    if isinstance(v, list):
        if len(v) <= 15:
            head = bytes([0x90 | len(v)])
        elif len(v) < 1 << 16:
            head = b"\xdc" + len(v).to_bytes(2, "big")
        else:
            head = b"\xdd" + len(v).to_bytes(4, "big")
        return head + b"".join(encode_msgpack(x) for x in v)
    if isinstance(v, dict):
        if len(v) <= 15:
            head = bytes([0x80 | len(v)])
        elif len(v) < 1 << 16:
            head = b"\xde" + len(v).to_bytes(2, "big")
        else:
            head = b"\xdf" + len(v).to_bytes(4, "big")
        out = head
        for k, x in v.items():
            if not isinstance(k, str):
                raise ValueError("msgpack: non-string map key")
            out += encode_msgpack(k) + encode_msgpack(x)
        return out
    raise ValueError(f"msgpack: unsupported type {type(v).__name__}")
