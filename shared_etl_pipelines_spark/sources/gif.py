"""Pure-python GIF87a codec (single frame, global 256-gray palette,
no interlace) — the third real image codec next to sources/png.py and
sources/bmp.py, so multimodal queries exercise actual bytes for the
third major container too.

GIF's LZW is the LSB-first cousin of the TIFF variant in
sources/raster.py: codes pack little-endian bit order, width grows at
table size 1<<width (no TIFF early change), data rides in <=255-byte
sub-blocks. Both directions implemented so tests round-trip without any
external imaging library (none exists in this sandbox).

No reference counterpart (LLM multimodal mandate); container layout per
the public GIF87a specification.
"""

from __future__ import annotations

import struct

import numpy as np

def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _lzw_encode_gif(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: LSB-first packing, width bump at table size
    1<<width, Clear emitted up-front and on table overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def reset() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, nxt, width = reset()
    emit(clear, width)
    w = b""
    for byte in indices:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        # canonical GIF schedule (one later than TIFF's early change):
        # width grows just BEFORE assigning index 1<<width, so the emit
        # above still used the old width
        if nxt == 4096:
            emit(clear, width)
            table, nxt, width = reset()
        else:
            if nxt == (1 << width) and width < 12:
                width += 1
            table[wc] = nxt
            nxt += 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    accbits = 0
    pos = 0

    def read(width: int) -> int:
        nonlocal acc, accbits, pos
        while accbits < width:
            if pos >= len(data):
                return eoi
            acc |= data[pos] << accbits
            pos += 1
            accbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev = b""
    while True:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            code = read(width)
            if code == eoi:
                break
            prev = table[code]
            out += prev
            continue
        if not table:
            raise ValueError("GIF LZW stream must start with Clear")
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _interlace_order(h: int) -> list:
    """GIF 4-pass interlace row order: rows 0::8, then 4::8, 2::4,
    1::2 — the storage order of an interlaced image block."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def encode_gif(img: np.ndarray, interlaced: bool = False) -> bytes:
    """Encode a 2-D uint8 grayscale array as a GIF87a (global gray
    palette, one image block; optionally 4-pass INTERLACED — rows
    stored in the 0::8, 4::8, 2::4, 1::2 order real progressive GIFs
    use)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected 2-D uint8 grayscale")
    h, w = img.shape
    out = bytearray(b"GIF87a")
    # logical screen: global table flag=1, color res=8, table size 256
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # grayscale global palette
        out += bytes((i, i, i))
    iflag = 0x40 if interlaced else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, iflag)
    out.append(8)  # LZW minimum code size
    rows = img[_interlace_order(h), :] if interlaced else img
    payload = _lzw_encode_gif(rows.tobytes())
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a GIF87a/89a single-frame image to 2-D uint8 of palette
    GRAY values (the palette's red channel; exact for gray palettes)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x2C:  # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if ipacked & 0x80:  # local palette overrides
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            mcs = data[pos]
            pos += 1
            payload = bytearray()
            while True:
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                payload += data[pos : pos + ln]
                pos += ln
            idx = np.frombuffer(
                _lzw_decode_gif(bytes(payload), mcs), dtype=np.uint8
            )[: iw * ih]
            if palette is None:
                raise ValueError("GIF without a color table")
            img = palette[idx, 0].reshape(ih, iw)
            if ipacked & 0x40:  # 4-pass interlace: invert the row order
                out_img = np.empty_like(img)
                out_img[_interlace_order(ih), :] = img
                img = out_img
            return img
        elif block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("no image block in GIF")


# ---------------------------------------------------------------------------
# GIF89a animation: multiple image blocks, each preceded by a Graphic
# Control Extension (delay, disposal, optional transparency), frames
# placed as sub-rectangles and COMPOSED onto the running canvas — the
# part of the format single-frame decoders skip and exactly what a
# frame-sampling pipeline needs (GIFs are a large slice of crawled
# "video"). Disposal 1 (leave) and 2 (restore background) implemented;
# transparent pixels skip composition.
# ---------------------------------------------------------------------------
def encode_gif_animated(
    frames: list,
    delays_cs: list | None = None,
    disposal: int = 1,
    transparent_index: int | None = None,
) -> bytes:
    """Encode GIF89a animation. ``frames`` is a list of
    (x, y, 2-D uint8 patch) tuples — frame 0 should cover the canvas;
    later frames may be sub-rectangles. ``delays_cs`` per-frame delays
    in centiseconds. Canvas size = frame 0's patch size."""
    if not frames:
        raise ValueError("no frames")
    x0, y0, base = frames[0]
    if x0 or y0:
        raise ValueError("frame 0 must cover the canvas at (0, 0)")
    h, w = base.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    # netscape loop extension (standard for animations; decoder skips)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi, (fx, fy, patch) in enumerate(frames):
        if patch.ndim != 2 or patch.dtype != np.uint8:
            raise ValueError("frames must be 2-D uint8 patches")
        ph, pw = patch.shape
        delay = int(delays_cs[fi]) if delays_cs else 0
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent_index is not None and fi > 0:
            flags |= 0x01
            tidx = transparent_index
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, flags, delay, tidx, 0)
        out += struct.pack("<BHHHHB", 0x2C, fx, fy, pw, ph, 0)
        out.append(8)
        payload = _lzw_encode_gif(patch.tobytes())
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(data: bytes) -> list:
    """Decode every frame of a GIF87a/89a, composing each onto the
    running canvas per its disposal method. Returns a list of
    (composed 2-D uint8 canvas, delay_cs) tuples. Disposal 1/0 leaves
    the canvas; disposal 2 restores the screen-descriptor background
    color (global-palette index, 0 if no global table) after the
    frame; transparent pixels do not overwrite."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w), dtype=np.uint8)
    frames = []
    delay = 0
    disposal = 0
    transparent = None
    while pos < len(data):
        block = data[pos]
        if block == 0x21 and pos + 1 < len(data) and data[pos + 1] == 0xF9:
            size = data[pos + 2]
            flags, delay, tidx = struct.unpack_from("<BHB", data, pos + 3)
            disposal = (flags >> 2) & 0x07
            transparent = tidx if flags & 0x01 else None
            pos += 3 + size + 1  # intro + body + terminator
        elif block == 0x21:  # other extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            fx, fy, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            pal = palette
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
                    n, 3
                )
                pos += 3 * n
            interlaced = bool(ipacked & 0x40)
            mcs = data[pos]
            pos += 1
            payload = bytearray()
            while True:
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                payload += data[pos : pos + ln]
                pos += ln
            idx = np.frombuffer(_lzw_decode_gif(bytes(payload), mcs), dtype=np.uint8)[
                : iw * ih
            ].reshape(ih, iw)
            if interlaced:  # invert the 4-pass row order
                deint = np.empty_like(idx)
                deint[_interlace_order(ih), :] = idx
                idx = deint
            if pal is None:
                raise ValueError("GIF without a color table")
            region = canvas[fy : fy + ih, fx : fx + iw]
            px = pal[idx, 0]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = px[mask]
            else:
                region[:] = px
            frames.append((canvas.copy(), delay))
            if disposal == 2:
                # Restore-to-background uses the logical screen
                # descriptor's background color index, resolved against
                # the GLOBAL color table (ADVICE r7 #3 — it may be
                # nonzero; a local palette does not redefine it). With
                # no global table the index is meaningless per spec:
                # fall back to 0.
                if palette is not None and _bg < palette.shape[0]:
                    bg_val = palette[_bg, 0]
                else:
                    bg_val = 0
                canvas[fy : fy + ih, fx : fx + iw] = bg_val
            disposal = 0
            transparent = None
            delay = 0
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("no image block in GIF")
    return frames
