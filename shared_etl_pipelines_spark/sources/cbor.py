"""CBOR decoding (RFC 8949) — the binary JSON of COSE/WebAuthn,
C2PA content-credentials manifests and IoT telemetry.

Crawl pipelines meet CBOR inside image provenance metadata (C2PA) and
device logs; this decoder covers the full core data model:

- major types 0-7: unsigned/negative ints, byte and text strings
  (strict UTF-8), arrays, maps, tags, simple values and floats;
- HALF-PRECISION floats decoded by hand (the RFC's own algorithm —
  subnormals, infinities and NaN included) along with f32/f64;
- indefinite-length strings (chunked, same-type chunks only, per the
  spec), arrays and maps with the 0xff break code;
- tags surfaced as (tag, value) — tag 2/3 bignums materialize to
  ints; other tags pass through transparently with the tag recorded;
- refusals: reserved additional-info values 28-30, a break code
  outside an indefinite item, mixed-type string chunks, non-string
  map keys (this repo's audit contract), duplicate map keys,
  truncation, trailing bytes.
"""
from __future__ import annotations

import struct

__all__ = ["decode_cbor", "encode_cbor"]

_BREAK = object()


def _head(b: bytes, pos: int) -> tuple[int, int, int | None, int]:
    """-> (major_type, additional_info, argument_or_None, new_pos)."""
    if pos >= len(b):
        raise ValueError("cbor: truncated — quarantine")
    ib = b[pos]
    mt, ai = ib >> 5, ib & 0x1F
    pos += 1
    if ai < 24:
        return mt, ai, ai, pos
    if ai == 24:
        n = 1
    elif ai == 25:
        n = 2
    elif ai == 26:
        n = 4
    elif ai == 27:
        n = 8
    elif ai == 31:
        return mt, ai, None, pos  # indefinite
    else:
        raise ValueError(f"cbor: reserved additional info {ai} — quarantine")
    if pos + n > len(b):
        raise ValueError("cbor: truncated argument — quarantine")
    return mt, ai, int.from_bytes(b[pos : pos + n], "big"), pos + n


def _half_to_float(h: int) -> float:
    """RFC 8949 appendix D decode of binary16."""
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        val = mant * 2.0 ** -24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = float("inf") if mant == 0 else float("nan")
    return -val if h & 0x8000 else val


def _decode(b: bytes, pos: int, depth: int = 0):
    if depth > 64:
        raise ValueError("cbor: nesting over 64 levels — quarantine")
    mt, ai, arg, pos = _head(b, pos)
    if mt == 0:
        return arg, pos
    if mt == 1:
        return -1 - arg, pos
    if mt in (2, 3):  # byte / text string
        if arg is None:  # indefinite: same-type definite chunks
            parts = []
            while True:
                if pos >= len(b):
                    raise ValueError("cbor: unterminated indefinite string")
                if b[pos] == 0xFF:
                    pos += 1
                    break
                cmt, _cai, carg, cpos = _head(b, pos)
                if cmt != mt or carg is None:
                    raise ValueError(
                        "cbor: mixed/indefinite chunk in string — quarantine"
                    )
                if cpos + carg > len(b):
                    raise ValueError("cbor: truncated string chunk")
                parts.append(b[cpos : cpos + carg])
                pos = cpos + carg
            raw = b"".join(parts)
        else:
            if pos + arg > len(b):
                raise ValueError("cbor: truncated string — quarantine")
            raw = b[pos : pos + arg]
            pos += arg
        if mt == 2:
            return raw, pos
        try:
            return raw.decode("utf-8", "strict"), pos
        except UnicodeDecodeError as e:
            raise ValueError(f"cbor: invalid UTF-8 text — quarantine ({e})") from e
    if mt == 4:
        out = []
        if arg is None:
            while True:
                v, pos = _decode_or_break(b, pos, depth + 1)
                if v is _BREAK:
                    return out, pos
                out.append(v)
        for _ in range(arg):
            v, pos = _decode(b, pos, depth + 1)
            out.append(v)
        return out, pos
    if mt == 5:
        out = {}

        def put(k, v):
            if not isinstance(k, str):
                raise ValueError("cbor: non-string map key — quarantine")
            if k in out:
                raise ValueError("cbor: duplicate map key — quarantine")
            out[k] = v

        if arg is None:
            while True:
                k, pos = _decode_or_break(b, pos, depth + 1)
                if k is _BREAK:
                    return out, pos
                v, pos = _decode(b, pos, depth + 1)
                put(k, v)
        for _ in range(arg):
            k, pos = _decode(b, pos, depth + 1)
            v, pos = _decode(b, pos, depth + 1)
            put(k, v)
        return out, pos
    if mt == 6:
        if arg is None:
            raise ValueError("cbor: indefinite tag — quarantine")
        v, pos = _decode(b, pos, depth + 1)
        if arg == 2:  # unsigned bignum
            if not isinstance(v, bytes):
                raise ValueError("cbor: bignum content not bytes")
            return int.from_bytes(v, "big"), pos
        if arg == 3:  # negative bignum
            if not isinstance(v, bytes):
                raise ValueError("cbor: bignum content not bytes")
            return -1 - int.from_bytes(v, "big"), pos
        return ("tag", arg, v), pos
    # mt == 7: simple values, floats, break
    if ai == 31:
        raise ValueError("cbor: break outside indefinite item — quarantine")
    if ai == 25:
        return _half_to_float(arg), pos
    if ai == 26:
        return struct.unpack(">f", arg.to_bytes(4, "big"))[0], pos
    if ai == 27:
        return struct.unpack(">d", arg.to_bytes(8, "big"))[0], pos
    # simple values (ai < 24 direct, ai == 24 one-byte)
    if arg == 20:
        return False, pos
    if arg == 21:
        return True, pos
    if arg == 22:
        return None, pos
    if arg == 23:
        return ("simple", 23, None), pos  # undefined — kept visible
    if ai == 24 and arg < 32:
        raise ValueError("cbor: non-minimal simple value — quarantine")
    return ("simple", arg, None), pos


def _decode_or_break(b: bytes, pos: int, depth: int):
    if pos < len(b) and b[pos] == 0xFF:
        return _BREAK, pos + 1
    return _decode(b, pos, depth)


def decode_cbor(b: bytes):
    v, pos = _decode(b, 0)
    if pos != len(b):
        raise ValueError("cbor: trailing bytes — quarantine")
    return v


def encode_cbor(v) -> bytes:
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if v is None:
        return b"\xf6"
    if isinstance(v, int):
        if v >= 0:
            return _head_enc(0, v)
        return _head_enc(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _head_enc(2, len(v)) + v
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return _head_enc(3, len(raw)) + raw
    if isinstance(v, list):
        return _head_enc(4, len(v)) + b"".join(encode_cbor(x) for x in v)
    if isinstance(v, dict):
        out = _head_enc(5, len(v))
        for k, x in v.items():
            if not isinstance(k, str):
                raise ValueError("cbor: non-string map key")
            out += encode_cbor(k) + encode_cbor(x)
        return out
    if isinstance(v, tuple) and len(v) == 3 and v[0] == "tag":
        return _head_enc(6, v[1]) + encode_cbor(v[2])
    raise ValueError(f"cbor: unsupported type {type(v).__name__}")


def _head_enc(mt: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(mt << 5) | arg])
    for ai, n in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if arg < 1 << (8 * n):
            return bytes([(mt << 5) | ai]) + arg.to_bytes(n, "big")
    # bignum territory: tag 2/3 handled by caller when needed
    raise ValueError("cbor: integer needs a bignum tag")
