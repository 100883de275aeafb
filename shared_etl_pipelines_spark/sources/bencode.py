"""Bencode + .torrent metainfo parsing (the BitTorrent wire format).

Web-scale datasets distribute over BitTorrent (Academic Torrents and
the large public corpora ship .torrent metainfo); a corpus-intake
audit reads the metainfo without touching the swarm. Bencode is tiny
but has one integrity property worth enforcing: dictionary keys MUST
appear in sorted byte order — a non-canonical dict re-encodes to
different bytes, which silently changes the infohash identity of the
torrent. This decoder therefore refuses unsorted or duplicate keys
(the quarantine-don't-guess contract), along with leading-zero
integers and ``i-0e`` (the spec's other canonicality rules).

``parse_torrent`` lifts the audit fields: announce, name, piece
length, piece count (pieces is a concatenation of 20-byte SHA-1s —
a length not divisible by 20 refuses), total payload length across
the single- and multi-file forms, and the private flag.
"""
from __future__ import annotations

__all__ = ["bdecode", "bencode", "parse_torrent"]


def _decode(b: bytes, pos: int, depth: int = 0):
    # Depth cap matches cbor.py: a 3000-deep "l...e" blob would otherwise
    # raise RecursionError, which escapes the except-ValueError quarantine
    # wrapper and kills the task instead of producing a quarantine row.
    if depth > 64:
        raise ValueError("bencode: nesting depth > 64 — quarantine")
    if pos >= len(b):
        raise ValueError("bencode: truncated — quarantine")
    c = b[pos : pos + 1]
    if c == b"i":
        end = b.find(b"e", pos)
        if end < 0:
            raise ValueError("bencode: unterminated integer — quarantine")
        raw = b[pos + 1 : end]
        if (
            not raw
            or (raw.startswith(b"0") and raw != b"0")
            or raw.startswith(b"-0")
        ):
            raise ValueError(f"bencode: non-canonical integer {raw!r}")
        return int(raw), end + 1
    if c == b"l":
        pos += 1
        out = []
        while True:
            if pos >= len(b):
                raise ValueError("bencode: unterminated list — quarantine")
            if b[pos : pos + 1] == b"e":
                return out, pos + 1
            v, pos = _decode(b, pos, depth + 1)
            out.append(v)
    if c == b"d":
        pos += 1
        out = {}
        prev = None
        while True:
            if pos >= len(b):
                raise ValueError("bencode: unterminated dict — quarantine")
            if b[pos : pos + 1] == b"e":
                return out, pos + 1
            k, pos = _decode(b, pos, depth + 1)
            if not isinstance(k, bytes):
                raise ValueError("bencode: non-string dict key — quarantine")
            if prev is not None and k <= prev:
                raise ValueError(
                    "bencode: dict keys not in canonical sorted order — "
                    "infohash-unstable, quarantine"
                )
            prev = k
            v, pos = _decode(b, pos, depth + 1)
            out[k] = v
    if c.isdigit():
        colon = b.find(b":", pos)
        if colon < 0:
            raise ValueError("bencode: unterminated string length")
        raw = b[pos:colon]
        if raw.startswith(b"0") and raw != b"0":
            raise ValueError("bencode: non-canonical string length")
        n = int(raw)
        if colon + 1 + n > len(b):
            raise ValueError("bencode: truncated string — quarantine")
        return b[colon + 1 : colon + 1 + n], colon + 1 + n
    raise ValueError(f"bencode: unknown type byte {c!r} — quarantine")


def bdecode(b: bytes):
    v, pos = _decode(b, 0)
    if pos != len(b):
        raise ValueError("bencode: trailing bytes — quarantine")
    return v


def bencode(v) -> bytes:
    if isinstance(v, int):
        return b"i%de" % v
    if isinstance(v, bytes):
        return b"%d:%s" % (len(v), v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return b"%d:%s" % (len(raw), raw)
    if isinstance(v, list):
        return b"l" + b"".join(bencode(x) for x in v) + b"e"
    if isinstance(v, dict):
        keys = [k if isinstance(k, bytes) else k.encode() for k in v]
        if keys != sorted(keys):
            raise ValueError("bencode: dict keys must be pre-sorted")
        out = b"d"
        for k in v:
            out += bencode(k) + bencode(v[k])
        return out + b"e"
    raise ValueError(f"bencode: unsupported type {type(v).__name__}")


def parse_torrent(blob: bytes) -> dict:
    meta = bdecode(blob)
    if not isinstance(meta, dict) or b"info" not in meta:
        raise ValueError("torrent: no info dict — quarantine")
    info = meta[b"info"]
    if not isinstance(info, dict):
        raise ValueError("torrent: info is not a dict — quarantine")
    pieces = info.get(b"pieces", b"")
    if not isinstance(pieces, bytes) or len(pieces) % 20:
        raise ValueError(
            "torrent: pieces is not a multiple of 20 bytes — quarantine"
        )
    if b"length" in info:
        total = info[b"length"]
        n_files = 1
    elif b"files" in info:
        files = info[b"files"]
        if not isinstance(files, list) or not files:
            raise ValueError("torrent: empty files list — quarantine")
        total = sum(f[b"length"] for f in files)
        n_files = len(files)
    else:
        raise ValueError("torrent: neither length nor files — quarantine")
    return {
        "announce": meta.get(b"announce", b"").decode("utf-8", "strict"),
        "name": info.get(b"name", b"").decode("utf-8", "strict"),
        "piece_length": int(info.get(b"piece length", 0)),
        "n_pieces": len(pieces) // 20,
        "total_length": int(total),
        "n_files": n_files,
        "private": int(info.get(b"private", 0)),
    }
