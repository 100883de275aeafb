"""Pure-python BMP (Windows DIB) codec — 24-bit uncompressed.

Third REAL image/container codec (after TIFF in raster.py and PNG in
png.py): BMP needs only struct unpacking plus the DIB pixel-array
layout — bottom-up rows of BGR triples, each row padded to a 4-byte
boundary. The DIB helpers are shared with the AVI reader
(sources/avi.py), whose '00db' frames are exactly this pixel array.

Scope (asserted): BITMAPINFOHEADER, biBitCount=24, biCompression=0
(BI_RGB), positive height (bottom-up). Encoder exists for fixtures.

Reference parity: the reference moves no bitmaps; this serves the LLM
multimodal mandate (real decode inside Arrow-batched mapInPandas).
"""

from __future__ import annotations

import struct

import numpy as np


def dib_row_size(width: int) -> int:
    """Bytes per DIB row: 3*width padded up to a multiple of 4."""
    return (3 * width + 3) & ~3


def dib_to_array(data: bytes, width: int, height: int) -> np.ndarray:
    """Bottom-up padded BGR rows -> (height, width, 3) RGB uint8."""
    stride = dib_row_size(width)
    if len(data) < stride * height:
        raise ValueError(f"DIB too short: {len(data)} < {stride * height}")
    rows = np.frombuffer(data[: stride * height], dtype=np.uint8).reshape(
        height, stride
    )
    bgr = rows[:, : 3 * width].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()  # flip vertical, BGR -> RGB


def array_to_dib(arr: np.ndarray) -> bytes:
    """(height, width, 3) RGB uint8 -> bottom-up padded BGR rows."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("DIB encoder expects RGB (h, w, 3)")
    stride = dib_row_size(w)
    bgr = arr[::-1, :, ::-1]  # flip vertical, RGB -> BGR
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return out.tobytes()


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a 24-bit BI_RGB BMP into ((h, w, 3) RGB uint8, info)."""
    if not is_bmp(data):
        raise ValueError("not a BMP (missing BM magic)")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    _planes, bits = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bits={bits} compression={compression}")
    if height <= 0:
        raise ValueError("only bottom-up BMP supported (height > 0)")
    arr = dib_to_array(data[pix_off:], width, height)
    return arr, {"width": width, "height": height, "channels": 3}


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> 24-bit BI_RGB BMP bytes."""
    h, w, _ = arr.shape
    pix = array_to_dib(arr)
    hdr = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return hdr + pix
