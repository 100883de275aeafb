"""Pure-python PNG codec (decode + minimal encode).

The container ships no image libraries, but PNG needs only zlib (stdlib)
plus the five scanline filters — the same DEFLATE + per-row predictor
machinery sources/raster.py already uses for TIFF. This gives the
multimodal pipeline a REAL decode path: sources/multimodal.py dispatches
on the PNG signature and falls back to its documented stub for formats
without codecs.

Scope (asserted, not silently wrong): bit depth 8, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both interlace methods
(0 = sequential, 1 = Adam7 — the progressive layout web exporters emit;
each of the seven passes is an independently filtered sub-image whose
pixels scatter back on the pass grid). Decoder: spec-complete for that
profile — all five filters (None, Sub, Up, Average, Paeth), multi-IDAT
streams. Encoder: fixtures/round-trip tests; any single filter type,
always one IDAT, optional Adam7.

Reference parity note: the reference pipelines move imagery as GeoTIFF /
COG (pipelines/sentinel/download-sentinel2-l2a-michigan.yml:15-35);
PNG support exists for the LLM multimodal mandate, not reference parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_dims(width: int, height: int):
    """Yield (x0, y0, dx, dy, pass_width, pass_height) for the non-empty
    Adam7 passes of a width x height image."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def is_png(data: bytes) -> bool:
    return data[:8] == SIGNATURE


def _chunks(data: bytes):
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, off)
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        yield ctype, body
        off += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse per-scanline filtering. Each scanline is 1 filter byte +
    ``stride`` data bytes; reconstruction is defined on the ORIGINAL
    (unfiltered) bytes of the current and prior row, so rows must be
    processed in order and in place."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        base = y * stride
        prior = out[base - stride : base] if y else bytes(stride)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up_left = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prior[i], up_left)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[base : base + stride] = line
    return out


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG into (array, info).

    Array shape: (height, width) for grayscale, else (height, width,
    channels); dtype uint8. Palette images are expanded to RGB.
    ``info``: width, height, color_type, channels (post-expansion).
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = None
    interlace = 0
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        # Adam7: seven independently filtered sub-images, scattered back
        # onto the pass grid
        arr = np.zeros((height, width, ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(width, height):
            pstride = pw * ch
            need = ph * (pstride + 1)
            if len(raw) - pos < need:
                raise ValueError("IDAT size mismatch")
            sub = _unfilter(raw[pos : pos + need], ph, pstride, ch)
            pos += need
            arr[y0::dy, x0::dx] = np.frombuffer(bytes(sub), dtype=np.uint8).reshape(
                ph, pw, ch
            )
        if pos != len(raw):
            raise ValueError("IDAT size mismatch")
    else:
        if len(raw) != height * (stride + 1):
            raise ValueError("IDAT size mismatch")
        flat = _unfilter(raw, height, stride, ch)
        arr = np.frombuffer(bytes(flat), dtype=np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        arr = palette[arr[:, :, 0]]
        ch = 3
    if ch == 1:
        arr = arr[:, :, 0]
    return arr, {
        "width": width,
        "height": height,
        "color_type": color_type,
        "channels": ch,
        "interlace": interlace,
    }


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _filter_line(
    ftype: int, line: bytes, prior: bytes, bpp: int
) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        left = line[i - bpp] if i >= bpp else 0
        up = prior[i]
        up_left = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, up_left)
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(
    arr: np.ndarray,
    color_type: int | None = None,
    filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """Encode a uint8 array as PNG. (h, w) -> grayscale; (h, w, 2/3/4) ->
    gray+alpha / RGB / RGBA. ``filter_type`` applies to every scanline
    (the decoder handles mixed; a real encoder would pick per row).
    ``interlace`` emits the Adam7 layout: each of the seven passes is
    extracted on its grid and filtered as an independent sub-image."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if _CHANNELS[color_type] != ch:
        raise ValueError(f"color type {color_type} wants {_CHANNELS[color_type]} channels, got {ch}")
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
            sub = np.ascontiguousarray(a[y0::dy, x0::dx])
            prior = bytes(pw * ch)
            for y in range(ph):
                line = sub[y].tobytes()
                raw.append(filter_type)
                raw += _filter_line(filter_type, line, prior, ch)
                prior = line
    else:
        prior = bytes(w * ch)
        for y in range(h):
            line = a[y].tobytes()
            raw.append(filter_type)
            raw += _filter_line(filter_type, line, prior, ch)
            prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )
