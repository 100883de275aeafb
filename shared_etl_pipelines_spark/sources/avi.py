"""Pure-python AVI (RIFF) codec — uncompressed 24-bit DIB frames.

Makes video frame-sampling REAL for one honest container format: the
RIFF walk is the same machinery as sources/wav.py (WAV is RIFF too),
and each '00db' frame payload is exactly the BMP pixel array
(sources/bmp.py dib_to_array). Everything a frame sampler needs —
frame count, dimensions, per-frame pixel access — comes from the
container itself, no codec library.

Scope (asserted): single video stream, 'DIB ' / BI_RGB 24-bit frames
('00db' chunks), any frame count. Compressed streams ('00dc') raise —
those still go through the documented stub path in multimodal.py.

Layout written by the encoder (and accepted by the decoder; the
decoder also tolerates extra chunks it doesn't know):

  RIFF('AVI ')
    LIST('hdrl') { 'avih', LIST('strl') { 'strh', 'strf' } }
    LIST('movi') { '00db' x n_frames }
"""

from __future__ import annotations

import struct

import numpy as np

from shared_etl_pipelines_spark.sources.bmp import array_to_dib, dib_to_array


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunks(data: bytes, off: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while off + 8 <= end:
        cid = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        yield cid, off + 8, size
        off += 8 + size + (size & 1)  # word-aligned


def decode_avi(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode into ((n_frames, h, w, 3) RGB uint8, info{width, height,
    n_frames, fps})."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    width = height = None
    fps = 0
    frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        nonlocal width, height, fps
        for cid, body, size in _chunks(data, off, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list type fourcc
            elif cid == b"avih":
                (us_per_frame,) = struct.unpack_from("<I", data, body)
                w, h = struct.unpack_from("<II", data, body + 32)
                width, height = int(w), int(h)
                fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
            elif cid == b"strf":
                bits = struct.unpack_from("<H", data, body + 14)[0]
                comp = struct.unpack_from("<I", data, body + 16)[0]
                if bits != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI stream: bits={bits} compression={comp}"
                    )
            elif cid == b"00dc":
                raise ValueError("compressed AVI frames not supported (00dc)")
            elif cid == b"00db":
                frames.append(data[body : body + size])

    walk(12, len(data))
    if width is None or not frames:
        raise ValueError("missing avih header or frames")
    arrs = np.stack([dib_to_array(f, width, height) for f in frames])
    return arrs, {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "fps": fps,
    }


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n_frames, h, w, 3) RGB uint8 -> minimal uncompressed AVI bytes."""
    n, h, w, _ = frames.shape
    dibs = [array_to_dib(f) for f in frames]
    frame_size = len(dibs[0])

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        frame_size * fps,  # max bytes per sec
        0, 0,  # padding granularity, flags
        n,  # total frames
        0, 1,  # initial frames, stream count
        frame_size,  # suggested buffer
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,  # scale, rate -> fps
        0, n, frame_size, 0, 0,
        0, 0, np.int16(w), np.int16(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
