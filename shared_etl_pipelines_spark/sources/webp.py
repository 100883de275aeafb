"""WebP container parsing — RIFF walk + VP8/VP8L/VP8X header decode.

WebP is the dominant modern crawl-image format next to JPEG/PNG (both
already first-class here). Public specs: RIFF framing (same container
family as the WAV/AVI modules), the VP8 keyframe header (RFC 6386 —
shared with ``sources/mkv.py``), the VP8L lossless signature header,
and the VP8X extended-features chunk (canvas size, alpha/animation
flags, ANMF frame census).

Scope is the corpus-audit layer: container kind, REAL bitstream-level
dimensions (decoded from the codec payload, not trusted metadata),
feature flags, and frame counts for animations. Full pixel decode of
the VP8 entropy partitions is out of scope and no field here depends
on it. Malformed structure raises ValueError — callers quarantine.
"""
from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.mkv import (
    encode_vp8_keyframe,
    parse_vp8_frame,
)

__all__ = [
    "is_webp",
    "parse_webp",
    "encode_webp_vp8",
    "encode_webp_vp8l",
    "encode_webp_vp8x",
]


def is_webp(blob: bytes) -> bool:
    return (
        len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    )


def _chunks(blob: bytes, start: int, end: int):
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("WebP: truncated chunk header — quarantine")
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("WebP: chunk overruns file — quarantine")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)  # RIFF even-byte padding


def _parse_vp8l_header(p: bytes) -> tuple[int, int, bool]:
    """VP8L: 0x2F signature then 14-bit width-1 / height-1 / alpha bit,
    little-endian bit order (WebP lossless spec §3)."""
    if len(p) < 5 or p[0] != 0x2F:
        raise ValueError("WebP: bad VP8L signature — quarantine")
    bits = int.from_bytes(p[1:5], "little")
    w = (bits & 0x3FFF) + 1
    h = ((bits >> 14) & 0x3FFF) + 1
    alpha = bool((bits >> 28) & 1)
    if (bits >> 29) & 0x7:
        raise ValueError("WebP: VP8L version bits reserved — quarantine")
    return w, h, alpha


def parse_webp(blob: bytes) -> dict:
    """Returns ``{kind: 'vp8'|'vp8l'|'vp8x', width, height, has_alpha,
    has_animation, n_frames}`` with dims decoded from the CODEC payload
    (VP8 keyframe header / VP8L signature header) for simple files and
    from the VP8X canvas for extended files (cross-checked against the
    first frame's bitstream when it is VP8/VP8L)."""
    if not is_webp(blob):
        raise ValueError("not a WebP (bad RIFF/WEBP header) — quarantine")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    end = min(8 + riff_size, len(blob))
    if 8 + riff_size > len(blob):
        raise ValueError("WebP: RIFF size overruns file — quarantine")
    first = None
    out = {
        "kind": "", "width": 0, "height": 0, "has_alpha": False,
        "has_animation": False, "n_frames": 0,
    }
    for fourcc, b, e in _chunks(blob, 12, end):
        if first is None:
            first = fourcc
            if fourcc == b"VP8 ":
                hdr = parse_vp8_frame(blob[b:e])
                if not hdr["keyframe"]:
                    raise ValueError("WebP: VP8 chunk is not a keyframe")
                out.update(
                    kind="vp8", width=hdr["width"], height=hdr["height"],
                    n_frames=1,
                )
            elif fourcc == b"VP8L":
                w, h, alpha = _parse_vp8l_header(blob[b:e])
                out.update(
                    kind="vp8l", width=w, height=h, has_alpha=alpha,
                    n_frames=1,
                )
            elif fourcc == b"VP8X":
                if e - b < 10:
                    raise ValueError("WebP: VP8X chunk truncated")
                flags = blob[b]
                if flags & 0xC1 or blob[b + 1 : b + 4] != b"\x00\x00\x00":
                    raise ValueError("WebP: VP8X reserved bits — quarantine")
                w = int.from_bytes(blob[b + 4 : b + 7], "little") + 1
                h = int.from_bytes(blob[b + 7 : b + 10], "little") + 1
                out.update(
                    kind="vp8x", width=w, height=h,
                    has_alpha=bool(flags & 0x10),
                    has_animation=bool(flags & 0x02),
                )
            else:
                raise ValueError(
                    f"WebP: unknown first chunk {fourcc!r} — quarantine"
                )
            continue
        if fourcc == b"ANMF":
            out["n_frames"] += 1
    if first is None:
        raise ValueError("WebP: no payload chunk — quarantine")
    if out["kind"] == "vp8x" and not out["has_animation"] and not out["n_frames"]:
        out["n_frames"] = 1
    return out


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff(payload: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def encode_webp_vp8(width: int, height: int, filler: bytes = b"") -> bytes:
    """Simple lossy WebP: one VP8 chunk with a REAL keyframe header."""
    return _riff(_chunk(b"VP8 ", encode_vp8_keyframe(width, height, 4, filler)))


def encode_webp_vp8l(width: int, height: int, alpha: bool = False) -> bytes:
    bits = (width - 1) | ((height - 1) << 14) | ((1 if alpha else 0) << 28)
    body = bytes([0x2F]) + bits.to_bytes(4, "little") + b"\x00"
    return _riff(_chunk(b"VP8L", body))


def encode_webp_vp8x(
    width: int,
    height: int,
    alpha: bool = False,
    n_anim_frames: int = 0,
) -> bytes:
    flags = (0x10 if alpha else 0) | (0x02 if n_anim_frames else 0)
    body = bytes([flags, 0, 0, 0])
    body += (width - 1).to_bytes(3, "little")
    body += (height - 1).to_bytes(3, "little")
    payload = _chunk(b"VP8X", body)
    if n_anim_frames:
        payload += _chunk(b"ANIM", b"\x00" * 6)
        for i in range(n_anim_frames):
            anmf = b"\x00" * 12 + bytes([i % 7]) * 4
            payload += _chunk(b"ANMF", anmf)
    else:
        payload += _chunk(b"VP8 ", encode_vp8_keyframe(width, height, 4))
    return _riff(payload)
