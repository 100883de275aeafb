"""GeoTIFF -> long-table raster ingestion, dependency-free.

The reference's core data artifacts are daily GeoTIFF rasters (one file
per day, date in the filename — e.g.
pipelines/prism/stage-ts-ppt-day-mi-rollsum-3d.yml:14,26 with
``input_filename_glob: prism_ppt_us_30s_*.tif``), consumed by plugins
that treat them as (y, x, value) grids. The engine models rasters as
long tables (SURVEY.md §7.0); this module closes the ingestion gap with
a minimal pure-numpy GeoTIFF codec so the PRISM/CDL-shaped pipelines can
run on their actual artifacts without GDAL:

- ``decode_geotiff``: classic TIFF **and BigTIFF** (magic 43, 64-bit
  offsets, LONG8/SLONG8/IFD8 types — the >4 GiB Sentinel-2 COG shape),
  single band, strip or tile layout, uncompressed / DEFLATE / LZW /
  PackBits, horizontal-differencing predictor,
  u8/u16/u32/i8/i16/i32/f32/f64 samples, GDAL nodata + GeoTIFF
  pixel-scale/tiepoint tags, and COG overview levels (chained
  reduced-resolution IFDs) selectable via ``overview=k`` — the
  cheap-scan path reading ~4^-k of the pixels.
- ``write_geotiff``: the matching writer (fixtures, round-trip tests,
  and staging outputs), including ``bigtiff=True`` containers and
  ``overviews=k`` chained 2x-average reduced IFDs.
- ``read_geotiff_long``: Spark's ``binaryFile`` source + ``mapInPandas``
  decode -> one row per pixel ``(day, y, x, value)`` with the G8
  date-from-filename regex applied to each path.

Scale shape: one task per file (binaryFile never splits a file), so a
year of daily rasters decodes 365-way parallel; decode output streams
through Arrow in bounded batches instead of materializing a python list
of all pixels. Column pruning/pushdown happen downstream on the long
table like any other source.
"""

from __future__ import annotations

import math
import os
import re
import struct
import zlib
from datetime import date, datetime
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RASTER_SCHEMA = "day date, y int, x int, value double"

# TIFF tag ids used here
_T_NEWSUBFILE = 254
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = 262, 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_SFORMAT = 339
_T_PIXEL_SCALE, _T_TIEPOINT = 33550, 33922
_T_GDAL_NODATA = 42113

_TYPE_SIZE = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4,
    12: 8, 16: 8, 17: 8, 18: 8,  # 16/17/18: BigTIFF LONG8/SLONG8/IFD8
}
_TYPE_FMT = {
    1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d",
    16: "Q", 17: "q", 18: "Q",
}

_DTYPES = {
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


def _read_ifd(
    data: bytes, e: str, off: int, big: bool = False
) -> tuple[dict[int, tuple], int]:
    """Parse one IFD; returns ``(tags, next_ifd_offset)`` (0 = end of
    chain). ``big=True`` switches to BigTIFF geometry: u64 entry count,
    20-byte entries (u64 value count, 8 inline bytes), u64 next-IFD
    pointer, and the LONG8/SLONG8/IFD8 value types."""
    if big:
        (n,) = struct.unpack_from(e + "Q", data, off)
        first, esz, inline_max = off + 8, 20, 8
    else:
        (n,) = struct.unpack_from(e + "H", data, off)
        first, esz, inline_max = off + 2, 12, 4
    tags: dict[int, tuple] = {}
    for i in range(n):
        base = first + i * esz
        tag, typ = struct.unpack_from(e + "HH", data, base)
        if big:
            (cnt,) = struct.unpack_from(e + "Q", data, base + 4)
            vbase = base + 12
        else:
            (cnt,) = struct.unpack_from(e + "I", data, base + 4)
            vbase = base + 8
        size = _TYPE_SIZE.get(typ, 1) * cnt
        voff = (
            vbase
            if size <= inline_max
            else struct.unpack_from(e + ("Q" if big else "I"), data, vbase)[0]
        )
        if typ == 2:  # ASCII
            tags[tag] = (data[voff : voff + cnt].split(b"\0", 1)[0].decode("ascii", "replace"),)
        elif typ in _TYPE_FMT:
            tags[tag] = struct.unpack_from(e + str(cnt) + _TYPE_FMT[typ], data, voff)
        # RATIONAL (5/10) and unknown types: not needed, skipped
    (nxt,) = struct.unpack_from(e + ("Q" if big else "I"), data, first + n * esz)
    return tags, nxt


def _lzw_decode(src: bytes) -> bytes:
    """TIFF-variant LZW decompression (TIFF 6.0 §13): MSB-first bit
    order, 8-bit symbols, Clear=256, EOI=257, code width 9->12 with the
    libtiff "early change" (width bumps when the NEXT table index would
    be 2^width - 1). Pure python — the hot path decodes whole strips
    inside scan-task mapInPandas, so this crosses into numpy right
    after."""
    CLEAR, EOI = 256, 257
    data = src
    acc = accbits = pos = 0

    def read(width: int) -> int:
        nonlocal acc, accbits, pos
        while accbits < width:
            if pos >= len(data):
                return EOI
            acc = (acc << 8) | data[pos]
            pos += 1
            accbits += 8
        accbits -= width
        return (acc >> accbits) & ((1 << width) - 1)

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev = b""
    while True:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            code = read(width)
            if code == EOI:
                break
            prev = table[code]
            out += prev
            continue
        if not table:
            raise ValueError("LZW stream must start with a Clear code")
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        if len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(src: bytes) -> bytes:
    """TIFF-variant LZW compression, symmetric with _lzw_decode (same
    early-change schedule); used by write_geotiff(compression="lzw") and
    the round-trip tests."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    def reset() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, nxt, width = reset()
    emit(CLEAR, width)
    w = b""
    for byte in src:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        # pair with the decoder's early-change schedule: it widens after
        # appending entry (1<<w)-1, i.e. starting with the code that
        # makes the table size reach 1<<w on this side
        if nxt == (1 << width) and width < 12:
            width += 1
        elif nxt == 4093:
            emit(CLEAR, width)
            table, nxt, width = reset()
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _unpackbits(b: bytes) -> bytes:
    """PackBits (RLE) decompression."""
    out = bytearray()
    i = 0
    while i < len(b):
        n = b[i]
        i += 1
        if n < 128:
            out += b[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += b[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _tiff_header(data: bytes) -> tuple[str, bool, int]:
    """Parse the TIFF header; returns ``(endianness, is_bigtiff,
    first_ifd_offset)``. Classic magic 42 (u32 offsets) and BigTIFF
    magic 43 (u64 offsets, offset-size field must be 8) both accepted."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic == 42:
        (ifd_off,) = struct.unpack_from(e + "I", data, 4)
        return e, False, ifd_off
    if magic == 43:
        osize, zero = struct.unpack_from(e + "HH", data, 4)
        if osize != 8 or zero != 0:
            raise ValueError(f"malformed BigTIFF header: offsize={osize}, pad={zero}")
        (ifd_off,) = struct.unpack_from(e + "Q", data, 8)
        return e, True, ifd_off
    raise ValueError(f"unsupported TIFF magic {magic}")


def list_overviews(data: bytes) -> list[tuple[int, int]]:
    """``(width, height)`` of every IFD in the file, full-resolution
    first — COG overview levels appear as successive reduced-resolution
    IFDs (NewSubfileType=1) on the next-IFD chain."""
    e, big, off = _tiff_header(data)
    dims = []
    while off:
        tags, off = _read_ifd(data, e, off, big)
        dims.append((tags[_T_WIDTH][0], tags[_T_HEIGHT][0]))
    return dims


def decode_geotiff(data: bytes, overview: int = 0) -> tuple[np.ndarray, dict]:
    """Decode a single-band classic or BigTIFF GeoTIFF from bytes.

    ``overview`` selects an IFD on the next-IFD chain: 0 = the
    full-resolution image, k = the k-th reduced-resolution (COG
    overview) level — the cheap-scan path at scale, reading ~4^-k of
    the pixel data. Raises if the file has no such level.

    Returns ``(array[h, w], meta)`` with meta keys: ``nodata`` (float or
    None), ``pixel_scale`` ((sx, sy, sz) or None), ``tiepoint`` (raw
    ModelTiepoint doubles or None), ``n_ifds`` (total IFD count — 1 +
    number of overview levels).
    """
    e, big, off = _tiff_header(data)
    ifds: list[dict[int, tuple]] = []
    while off:
        t, off = _read_ifd(data, e, off, big)
        ifds.append(t)
    if overview >= len(ifds):
        raise ValueError(
            f"overview level {overview} not present ({len(ifds)} IFDs in file)"
        )
    tags, n_ifds = ifds[overview], len(ifds)

    width, height = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
    bps = tags.get(_T_BPS, (8,))[0]
    comp = tags.get(_T_COMP, (1,))[0]
    sfmt = tags.get(_T_SFORMAT, (1,))[0]
    predictor = tags.get(_T_PREDICTOR, (1,))[0]
    spp = tags.get(_T_SPP, (1,))[0]
    if spp != 1:
        raise ValueError(f"single-band rasters only (SamplesPerPixel={spp})")
    key = (sfmt, bps)
    if key not in _DTYPES:
        raise ValueError(f"unsupported sample format/bits: {key}")
    dt = np.dtype(_DTYPES[key]).newbyteorder(e)

    def decomp(chunk: bytes) -> bytes:
        if comp == 1:
            return chunk
        if comp in (8, 32946):  # DEFLATE (new/old code)
            return zlib.decompress(chunk)
        if comp == 5:
            return _lzw_decode(chunk)
        if comp == 32773:
            return _unpackbits(chunk)
        raise ValueError(f"unsupported compression {comp}")

    def undiff(block: np.ndarray) -> np.ndarray:
        # predictor 2: horizontal differencing per row
        if predictor == 2:
            return np.cumsum(block, axis=1, dtype=block.dtype)
        return block

    if _T_TILE_OFF in tags:
        tw, th = tags[_T_TILE_W][0], tags[_T_TILE_H][0]
        offs, cnts = tags[_T_TILE_OFF], tags[_T_TILE_CNT]
        ntx = math.ceil(width / tw)
        arr = np.zeros((height, width), dtype=dt)
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            tile = np.frombuffer(decomp(data[o : o + c]), dtype=dt)[: tw * th]
            tile = undiff(tile.reshape(th, tw))
            ty, tx = divmod(idx, ntx)
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, height - y0), min(tw, width - x0)
            arr[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    else:
        rps = tags.get(_T_RPS, (height,))[0] or height
        offs, cnts = tags[_T_STRIP_OFF], tags[_T_STRIP_CNT]
        chunks = []
        for i, (o, c) in enumerate(zip(offs, cnts)):
            nrows = min(rps, height - i * rps)
            chunk = np.frombuffer(decomp(data[o : o + c]), dtype=dt)[: nrows * width]
            chunks.append(undiff(chunk.reshape(nrows, width)))
        arr = np.vstack(chunks) if len(chunks) > 1 else chunks[0]

    meta = {
        "nodata": float(tags[_T_GDAL_NODATA][0]) if _T_GDAL_NODATA in tags else None,
        "pixel_scale": tags.get(_T_PIXEL_SCALE),
        "tiepoint": tags.get(_T_TIEPOINT),
        "n_ifds": n_ifds,
    }
    return arr, meta


def downsample2x(a: np.ndarray) -> np.ndarray:
    """One COG overview step: 2x2 block average (odd edges clamped by
    repeating the last row/column), truncated back to the input dtype
    for integer rasters — closed-form reproducible, so overview reads
    stay SQL-oracle-checkable."""
    if a.shape[0] % 2:
        a = np.vstack([a, a[-1:]])
    if a.shape[1] % 2:
        a = np.hstack([a, a[:, -1:]])
    h2, w2 = a.shape[0] // 2, a.shape[1] // 2
    m = a.reshape(h2, 2, w2, 2).astype("f8").mean(axis=(1, 3))
    return m.astype(a.dtype)


def _image_blocks_entries(
    arr: np.ndarray,
    compress: bool | str,
    tile: int | None,
    nodata: float | None,
    pixel_scale,
    origin,
    reduced: bool,
) -> tuple[list[bytes], list[tuple[int, int, int, tuple]]]:
    """Encode one image into (blocks, IFD entries); offset tags carry
    ``None`` values to be patched by the serializer."""
    h, w = arr.shape
    kind_map = {"u": 1, "i": 2, "f": 3}
    sfmt = kind_map.get(arr.dtype.kind)
    if sfmt is None:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    bps = arr.dtype.itemsize * 8
    arr = arr.astype(arr.dtype.newbyteorder("<"))

    blocks: list[bytes] = []
    if tile:
        nty, ntx = math.ceil(h / tile), math.ceil(w / tile)
        for ty in range(nty):
            for tx in range(ntx):
                blk = np.zeros((tile, tile), dtype=arr.dtype)
                seg = arr[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
                blk[: seg.shape[0], : seg.shape[1]] = seg
                blocks.append(blk.tobytes())
    else:
        blocks.append(arr.tobytes())
    if compress == "lzw":
        blocks = [_lzw_encode(b) for b in blocks]
    elif compress:
        blocks = [zlib.compress(b) for b in blocks]

    entries: list[tuple[int, int, int, tuple]] = [
        (_T_WIDTH, 4, 1, (w,)),
        (_T_HEIGHT, 4, 1, (h,)),
        (_T_BPS, 3, 1, (bps,)),
        (_T_COMP, 3, 1, (5 if compress == "lzw" else 8 if compress else 1,)),
        (_T_PHOTO, 3, 1, (1,)),  # BlackIsZero
        (_T_SPP, 3, 1, (1,)),
        (_T_SFORMAT, 3, 1, (sfmt,)),
    ]
    if reduced:
        entries.append((_T_NEWSUBFILE, 4, 1, (1,)))  # reduced-resolution image
    if tile:
        entries += [
            (_T_TILE_W, 3, 1, (tile,)),
            (_T_TILE_H, 3, 1, (tile,)),
            (_T_TILE_OFF, 4, len(blocks), None),  # patched by serializer
            (_T_TILE_CNT, 4, len(blocks), tuple(len(b) for b in blocks)),
        ]
    else:
        entries += [
            (_T_STRIP_OFF, 4, 1, None),
            (_T_RPS, 4, 1, (h,)),
            (_T_STRIP_CNT, 4, 1, (len(blocks[0]),)),
        ]
    if pixel_scale is not None:
        entries.append((_T_PIXEL_SCALE, 12, 3, (pixel_scale[0], pixel_scale[1], 0.0)))
    if origin is not None:
        entries.append((_T_TIEPOINT, 12, 6, (0.0, 0.0, 0.0, origin[0], origin[1], 0.0)))
    if nodata is not None:
        nd = f"{nodata:g}\0".encode("ascii")
        entries.append((_T_GDAL_NODATA, 2, len(nd), nd))
    entries.sort(key=lambda t: t[0])
    return blocks, entries


def write_geotiff(
    path: str,
    arr: np.ndarray,
    nodata: float | None = None,
    compress: bool | str = False,
    tile: int | None = None,
    pixel_scale: tuple[float, float] | None = None,
    origin: tuple[float, float] | None = None,
    bigtiff: bool = False,
    overviews: int = 0,
) -> None:
    """Write a single-band GeoTIFF (little-endian).

    Strip layout by default (one strip per raster); ``tile`` switches to
    square tiles of that size. ``compress`` applies DEFLATE when truthy;
    pass ``"lzw"`` for TIFF-LZW (the wild-GeoTIFF default codec).
    ``bigtiff=True`` emits the BigTIFF container (magic 43, 64-bit
    offsets, LONG8 block-offset tags — what real Sentinel-2 COG assets
    use once they cross 4 GiB). ``overviews=k`` appends k chained
    reduced-resolution IFDs (COG overview levels), each a 2x block
    average of the previous (``downsample2x``), sharing the codec/tile
    layout of the main image.
    """
    arr = np.ascontiguousarray(arr)
    if arr.ndim != 2:
        raise ValueError("expected a 2-D array")

    images = [arr]
    for _ in range(overviews):
        images.append(downsample2x(images[-1]))
    per_img = [
        _image_blocks_entries(
            a, compress, tile, nodata,
            pixel_scale if i == 0 else None,
            origin if i == 0 else None,
            reduced=i > 0,
        )
        for i, a in enumerate(images)
    ]

    # geometry knobs per container flavor
    if bigtiff:
        header_size, esz, cnt_fld, inline_max, off_fmt = 16, 20, 8, 8, "Q"
        off_typ = 16  # LONG8 block offsets — exercises the 8-byte types
    else:
        header_size, esz, cnt_fld, inline_max, off_fmt = 8, 12, 2, 4, "I"
        off_typ = 4
    ptr_size = 8 if bigtiff else 4

    def enc_values(typ: int, cnt: int, vals) -> bytes:
        if typ == 2:
            return bytes(vals)
        fmt = {3: "H", 4: "I", 12: "d", 16: "Q"}[typ]
        return struct.pack("<" + str(cnt) + fmt, *vals)

    # pass 1 — lay out: header | (IFD_i + overflow_i)... | all block data
    ifd_offs, overflow_offs = [], []
    pos = header_size
    for blocks, entries in per_img:
        ifd_offs.append(pos)
        pos += cnt_fld + len(entries) * esz + ptr_size
        overflow_offs.append(pos)
        for tag, typ, cnt, vals in entries:
            typ = off_typ if vals is None else typ
            size = _TYPE_SIZE[typ] * cnt
            if size > inline_max:
                pos += size
    block_offsets_per_img: list[list[int]] = []
    for blocks, _ in per_img:
        offs = []
        for b in blocks:
            offs.append(pos)
            pos += len(b)
        block_offsets_per_img.append(offs)

    # pass 2 — serialize
    out = bytearray()
    if bigtiff:
        out += struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_offs[0])
    else:
        out += struct.pack("<2sHI", b"II", 42, ifd_offs[0])
    for i, (blocks, entries) in enumerate(per_img):
        assert len(out) == ifd_offs[i], f"layout bug: {len(out)} != {ifd_offs[i]}"
        out += struct.pack("<" + ("Q" if bigtiff else "H"), len(entries))
        overflow = bytearray()
        ovf_base = overflow_offs[i]
        for tag, typ, cnt, vals in entries:
            if vals is None:  # offsets tag
                typ, vals = off_typ, tuple(block_offsets_per_img[i])
            enc = enc_values(typ, cnt, vals)
            if bigtiff:
                hdr = struct.pack("<HHQ", tag, typ, cnt)
            else:
                hdr = struct.pack("<HHI", tag, typ, cnt)
            if len(enc) <= inline_max:
                out += hdr + enc.ljust(inline_max, b"\0")
            else:
                out += hdr + struct.pack("<" + off_fmt, ovf_base + len(overflow))
                overflow += enc
        nxt = ifd_offs[i + 1] if i + 1 < len(per_img) else 0
        out += struct.pack("<" + off_fmt, nxt)
        out += overflow
    for offs, (blocks, _) in zip(block_offsets_per_img, per_img):
        for o, b in zip(offs, blocks):
            assert len(out) == o, f"layout bug: {len(out)} != {o}"
            out += b
    with open(path, "wb") as f:
        f.write(bytes(out))


def date_from_path(path: str, date_regex: str = r"(\d{8})") -> date | None:
    """G8 date-from-filename contract: first YYYYMMDD group in the basename
    (pipelines/prism/prism-mi-corn-ppt-county.yml:82 ``day_from_filename_regex``)."""
    m = re.search(date_regex, os.path.basename(path))
    if not m:
        return None
    return datetime.strptime(m.group(1), "%Y%m%d").date()


def read_geotiff_long(
    spark: SparkSession,
    path: str,
    date_regex: str = r"(\d{8})",
    drop_nodata: bool = True,
    batch_rows: int = 1 << 18,
    on_error: str = "fail",
    overview: int = 0,
) -> DataFrame:
    """Read GeoTIFF file(s) as a long table ``(day, y, x, value)``.

    ``path`` may be a file, directory, or glob — anything Spark's
    ``binaryFile`` source accepts. One decode task per file (binaryFile
    never splits), so a daily-raster directory parallelizes by day;
    pixels stream out in ``batch_rows``-sized Arrow batches to bound
    executor memory however large a single raster is.

    ``on_error``: ``"fail"`` (default) raises on an undecodable file with
    its path in the message; ``"skip"`` drops it and continues — the
    ignoreCorruptFiles posture for bulk backfills over scraped archives.

    ``overview``: COG overview level to decode (0 = full resolution).
    Level k emits ~4^-k of the rows — the cheap-scan path when a
    pipeline only needs coarse statistics over 100 TB of imagery.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    arr, meta = decode_geotiff(bytes(content), overview=overview)
                except Exception as e:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"undecodable GeoTIFF {p}: {e}") from e
                day = date_from_path(p, date_regex)
                h, w = arr.shape
                vals = arr.reshape(-1).astype("f8")
                ys = np.repeat(np.arange(h, dtype="i4"), w)
                xs = np.tile(np.arange(w, dtype="i4"), h)
                if drop_nodata and meta["nodata"] is not None:
                    keep = vals != meta["nodata"]
                    vals, ys, xs = vals[keep], ys[keep], xs[keep]
                for s in range(0, len(vals), batch_rows):
                    sl = slice(s, s + batch_rows)
                    yield pd.DataFrame(
                        {"day": day, "y": ys[sl], "x": xs[sl], "value": vals[sl]}
                    )

    bf = spark.read.format("binaryFile").load(path).select("path", "content")
    return bf.mapInPandas(decode, RASTER_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic demo corpus: 10 daily PRISM-named rasters whose pixel
# values follow an integer formula a SQL oracle can regenerate exactly —
# the correctness bridge for the binary decode path (DuckDB cannot read
# TIFF, but it can recompute (d*7919 + y*31 + x*17) % 1000). Layout/codec
# varies per day so one query exercises strips, tiles, DEFLATE and all
# the numeric dtypes.
# ---------------------------------------------------------------------------
DEMO_DAYS = 10
DEMO_SIZE = 16
DEMO_START = date(2024, 3, 1)
DEMO_NODATA = 999.0


def demo_raster_values(d: int) -> np.ndarray:
    yy, xx = np.mgrid[0:DEMO_SIZE, 0:DEMO_SIZE]
    return (d * 7919 + yy * 31 + xx * 17) % 1000


def ensure_demo_rasters(base_dir: str | None = None) -> str:
    """Write (idempotently) the demo GeoTIFF corpus; returns its directory."""
    import tempfile

    root = base_dir or os.path.join(tempfile.gettempdir(), "spark_graft_tif_demo_v3")
    os.makedirs(root, exist_ok=True)
    from datetime import timedelta

    for d in range(DEMO_DAYS):
        day = DEMO_START + timedelta(days=d)
        name = f"prism_ppt_us_30s_{day.strftime('%Y%m%d')}.tif"
        path = os.path.join(root, name)
        if os.path.exists(path):
            continue
        vals = demo_raster_values(d)
        dtype = {5: "f8", 7: "f4", 4: "u2"}.get(d, "i4")
        write_geotiff(
            path + ".tmp",
            vals.astype(dtype),
            nodata=DEMO_NODATA,
            # rotate codecs so the driver-visible query exercises all
            # three: uncompressed, DEFLATE, and TIFF-LZW
            compress="lzw" if d % 4 == 3 else (d % 2 == 1),
            tile=8 if d % 3 == 0 else None,
            # rotate containers too: two days are BigTIFF (magic 43,
            # LONG8 offsets — the >4 GiB Sentinel-2 COG shape), and
            # every day carries one COG overview level (tiled days two)
            # so the overview-scan query covers the whole corpus
            bigtiff=d in (2, 7),
            overviews=2 if d % 3 == 0 else 1,
            pixel_scale=(0.0083, 0.0083),
            origin=(-125.0, 49.94),
        )
        os.replace(path + ".tmp", path)
    return root
