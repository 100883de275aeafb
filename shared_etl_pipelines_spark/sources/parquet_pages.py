"""Parquet COLUMN DATA decode from raw bytes — the PUBLIC
parquet-format spec (Encodings.md + PageHeader in parquet.thrift),
layered on the repo's own Thrift compact walker
(sources/parquet_footer.py) and its own page codecs: snappy
(sources/snappy.py), LZ4_RAW (sources/lz4.py), zstd
(sources/zstd_decode.py), gzip (zlib).

With this module the ENTIRE parquet read path for flat columns is
independent of pyarrow: footer -> column chunk -> page headers (thrift
compact) -> page decompression -> definition levels (RLE/bit-packed
hybrid) -> values (PLAIN for INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY/
BOOLEAN, and dictionary pages with RLE_DICTIONARY indices). pyarrow-
written files are therefore a true cross-implementation check of the
whole chain.

Scope: flat (non-nested) columns, data page v1 and v2, max_def <= 1
(top-level required/optional), encodings PLAIN / RLE(boolean) /
dictionary / DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY /
DELTA_BYTE_ARRAY / BYTE_STREAM_SPLIT. Repeated fields and
encrypted pages refuse loudly.
"""

from __future__ import annotations

import struct
import zlib

from shared_etl_pipelines_spark.sources.parquet_footer import (
    parse_parquet_footer,
)
from shared_etl_pipelines_spark.sources.thrift_compact import decode_struct

__all__ = ["read_column", "read_all_columns"]


def _decompress(data: bytes, codec: str, usize: int) -> bytes:
    if codec == "UNCOMPRESSED":
        return data
    if codec == "SNAPPY":
        from shared_etl_pipelines_spark.sources.snappy import snappy_decompress

        return snappy_decompress(data)
    if codec == "GZIP":
        return zlib.decompress(data, 47)
    if codec == "ZSTD":
        from shared_etl_pipelines_spark.sources.zstd_decode import (
            zstd_decompress,
        )

        return zstd_decompress(data)
    if codec == "LZ4_RAW":
        from shared_etl_pipelines_spark.sources.lz4 import lz4_block_decompress

        return lz4_block_decompress(data, expected=usize)
    raise ValueError(f"parquet: page codec {codec} unsupported — quarantine")


def _rle_bitpacked(buf: bytes, p: int, width: int, n: int) -> tuple[list[int], int]:
    """The RLE/bit-packed hybrid (Encodings.md §RLE). Returns exactly
    ``n`` values; the caller supplies the region, we stop on count."""
    out: list[int] = []
    if width == 0:
        return [0] * n, p
    byte_w = (width + 7) // 8
    while len(out) < n:
        if p >= len(buf):
            raise ValueError("parquet: RLE region truncated — quarantine")
        header = 0
        shift = 0
        while True:
            b = buf[p]
            p += 1
            header |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if header & 1:  # bit-packed: (header>>1) groups of 8 values
            n_groups = header >> 1
            n_bytes = n_groups * width
            if p + n_bytes > len(buf):
                raise ValueError("parquet: bit-packed run truncated")
            bits = int.from_bytes(buf[p : p + n_bytes], "little")
            for i in range(n_groups * 8):
                out.append((bits >> (i * width)) & ((1 << width) - 1))
            p += n_bytes
        else:  # RLE run
            count = header >> 1
            if p + byte_w > len(buf):
                raise ValueError("parquet: RLE run truncated")
            v = int.from_bytes(buf[p : p + byte_w], "little")
            p += byte_w
            out.extend([v] * count)
    return out[:n], p


def _plain_values(buf: bytes, p: int, ptype: str, n: int) -> list:
    out: list = []
    if ptype == "INT32":
        out = list(struct.unpack_from(f"<{n}i", buf, p))
    elif ptype == "INT64":
        out = list(struct.unpack_from(f"<{n}q", buf, p))
    elif ptype == "FLOAT":
        out = list(struct.unpack_from(f"<{n}f", buf, p))
    elif ptype == "DOUBLE":
        out = list(struct.unpack_from(f"<{n}d", buf, p))
    elif ptype == "BOOLEAN":
        for i in range(n):
            out.append(bool(buf[p + (i >> 3)] >> (i & 7) & 1))
    elif ptype == "BYTE_ARRAY":
        for _ in range(n):
            (ln,) = struct.unpack_from("<I", buf, p)
            p += 4
            if p + ln > len(buf):
                raise ValueError("parquet: byte array overruns page")
            out.append(buf[p : p + ln])
            p += ln
    else:
        raise ValueError(f"parquet: PLAIN decode for {ptype} unsupported")
    return out


def _read_pages(
    blob: bytes, col: dict, optional: bool, base: int = 0
) -> list:
    codec = col["codec"]
    ptype = col["type"]
    n_total = col["num_values"]
    # chunk starts at the dictionary page when present, else data page
    start = col["data_page_offset"]
    if col.get("dictionary_page_offset"):
        start = min(start, col["dictionary_page_offset"])
    # `base` rebases the footer's absolute file offsets onto a blob that
    # holds only this column chunk's byte span (ranged scan tasks)
    p = start - base
    dictionary: list | None = None
    out: list = []
    while len(out) < n_total:
        hdr, q = decode_struct(blob[p:])
        page_type = hdr.get(1)
        usize = hdr.get(2)
        csize = hdr.get(3)
        body = blob[p + q : p + q + csize]
        if len(body) < csize:
            raise ValueError("parquet: page overruns file — quarantine")
        p = p + q + csize
        if page_type == 2:  # dictionary page
            dhdr = hdr.get(7, {})
            n_dict = dhdr.get(1, 0)
            raw = _decompress(body, codec, usize)
            dictionary = _plain_values(raw, 0, ptype, n_dict)
            continue
        if page_type == 0:  # data page v1
            dph = hdr.get(5, {})
            n_vals = dph.get(1)
            enc = dph.get(2)
            raw = _decompress(body, codec, usize)
            r = 0
            defs = [1] * n_vals
            if optional:
                (dl_len,) = struct.unpack_from("<I", raw, r)
                r += 4
                defs, _ = _rle_bitpacked(raw[r : r + dl_len], 0, 1, n_vals)
                r += dl_len
            out.extend(_decode_values(raw, r, enc, ptype, defs, dictionary))
        elif page_type == 3:  # data page v2
            dph = hdr.get(8, {})
            n_vals = dph.get(1)
            n_nulls = dph.get(3, 0)
            enc = dph.get(4)
            dl_len = dph.get(5, 0)
            rl_len = dph.get(6, 0)
            is_comp = dph.get(7, True)
            if rl_len:
                raise ValueError("parquet: repeated fields unsupported")
            levels = body[: dl_len]
            vals_part = body[dl_len + rl_len :]
            if is_comp:
                vals_part = _decompress(
                    vals_part, codec, usize - dl_len - rl_len
                )
            defs = (
                _rle_bitpacked(levels, 0, 1, n_vals)[0]
                if optional and dl_len
                else [1] * n_vals
            )
            out.extend(_decode_values(vals_part, 0, enc, ptype, defs, dictionary))
        elif page_type == 1:  # index page: skip
            continue
        else:
            raise ValueError(f"parquet: page type {page_type} unsupported")
    return out[:n_total]


def _uleb(buf: bytes, p: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if p >= len(buf):
            raise ValueError("parquet: truncated varint")
        b = buf[p]
        v |= (b & 0x7F) << shift
        p += 1
        if not b & 0x80:
            return v, p
        shift += 7


def _zigzag_leb(buf: bytes, p: int) -> tuple[int, int]:
    u, p = _uleb(buf, p)
    return (u >> 1) ^ -(u & 1), p


def _delta_binary_packed(buf: bytes, p: int) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (Encodings.md §Delta encoding): ULEB header
    (block size, miniblocks/block, total count, zigzag first value),
    then per block a zigzag min-delta, one bit width per miniblock, and
    LSB-first bit-packed delta payloads."""
    block_size, p = _uleb(buf, p)
    n_mini, p = _uleb(buf, p)
    total, p = _uleb(buf, p)
    if n_mini == 0 or block_size % n_mini:
        raise ValueError("parquet: bad delta header — quarantine")
    per_mini = block_size // n_mini
    first, p = _zigzag_leb(buf, p)
    out = [first]
    while len(out) < total:
        min_delta, p = _zigzag_leb(buf, p)
        if p + n_mini > len(buf):
            raise ValueError("parquet: truncated delta bit widths")
        widths = list(buf[p : p + n_mini])
        p += n_mini
        for w in widths:
            if len(out) >= total and w == 0:
                continue  # padding miniblocks after the last value
            n_bytes = (per_mini * w + 7) // 8
            if p + n_bytes > len(buf):
                raise ValueError("parquet: truncated delta miniblock")
            bits = int.from_bytes(buf[p : p + n_bytes], "little")
            p += n_bytes
            for i in range(per_mini):
                if len(out) >= total:
                    break
                d = (bits >> (i * w)) & ((1 << w) - 1) if w else 0
                out.append(out[-1] + min_delta + d)
    return out[:total], p


def _delta_length_byte_array(buf: bytes, p: int) -> tuple[list[bytes], int]:
    lengths, p = _delta_binary_packed(buf, p)
    out = []
    for ln in lengths:
        if ln < 0 or p + ln > len(buf):
            raise ValueError("parquet: delta-length payload overruns")
        out.append(buf[p : p + ln])
        p += ln
    return out, p


def _delta_byte_array(buf: bytes, p: int) -> tuple[list[bytes], int]:
    prefixes, p = _delta_binary_packed(buf, p)
    suffixes, p = _delta_length_byte_array(buf, p)
    if len(prefixes) != len(suffixes):
        raise ValueError("parquet: delta-byte-array count mismatch")
    out: list[bytes] = []
    prev = b""
    for pre, suf in zip(prefixes, suffixes):
        if pre < 0 or pre > len(prev):
            raise ValueError("parquet: delta prefix overruns previous value")
        prev = prev[:pre] + suf
        out.append(prev)
    return out, p


_BSS_WIDTH = {"FLOAT": ("<f", 4), "DOUBLE": ("<d", 8),
              "INT32": ("<i", 4), "INT64": ("<q", 8)}


def _byte_stream_split(buf: bytes, ptype: str, n: int) -> list:
    if ptype not in _BSS_WIDTH:
        raise ValueError(f"parquet: BYTE_STREAM_SPLIT for {ptype} unsupported")
    fmt, k = _BSS_WIDTH[ptype]
    if len(buf) < n * k:
        raise ValueError("parquet: byte-stream-split payload truncated")
    out = []
    for i in range(n):
        raw = bytes(buf[j * n + i] for j in range(k))
        out.append(struct.unpack(fmt, raw)[0])
    return out


def _decode_values(
    raw: bytes, r: int, enc: int, ptype: str, defs: list[int],
    dictionary: list | None,
) -> list:
    n_present = sum(defs)
    if enc == 0:  # PLAIN
        vals = _plain_values(raw[r:], 0, ptype, n_present)
    elif enc == 3:  # RLE: boolean values (bit width 1, 4-byte length prefix)
        if ptype != "BOOLEAN":
            raise ValueError("parquet: RLE values only for BOOLEAN")
        (ln,) = struct.unpack_from("<I", raw, r)
        bits_, _ = _rle_bitpacked(raw[r + 4 : r + 4 + ln], 0, 1, n_present)
        vals = [bool(b) for b in bits_]
    elif enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY indices
        if dictionary is None:
            raise ValueError("parquet: dictionary indices with no dictionary")
        if r >= len(raw):
            raise ValueError("parquet: truncated dictionary page body")
        width = raw[r]
        idx, _ = _rle_bitpacked(raw, r + 1, width, n_present)
        try:
            vals = [dictionary[i] for i in idx]
        except IndexError:
            raise ValueError("parquet: dictionary index out of range") from None
    elif enc == 5:  # DELTA_BINARY_PACKED
        if ptype not in ("INT32", "INT64"):
            raise ValueError("parquet: delta encoding only for ints")
        vals, _ = _delta_binary_packed(raw, r)
        if len(vals) != n_present:
            raise ValueError("parquet: delta count mismatch — quarantine")
    elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
        vals, _ = _delta_length_byte_array(raw, r)
        if len(vals) != n_present:
            raise ValueError("parquet: delta-length count mismatch")
    elif enc == 7:  # DELTA_BYTE_ARRAY
        vals, _ = _delta_byte_array(raw, r)
        if len(vals) != n_present:
            raise ValueError("parquet: delta-byte-array count mismatch")
    elif enc == 9:  # BYTE_STREAM_SPLIT
        vals = _byte_stream_split(raw[r:], ptype, n_present)
    else:
        raise ValueError(f"parquet: encoding {enc} unsupported — quarantine")
    it = iter(vals)
    return [next(it) if d else None for d in defs]


def read_column(blob: bytes, rg_idx: int, col_path: str) -> list:
    """All values of one flat column in one row group (None = null)."""
    foot = parse_parquet_footer(blob)
    rg = foot["row_groups"][rg_idx]
    col = next((c for c in rg["columns"] if c["path"] == col_path), None)
    if col is None:
        raise ValueError(f"parquet: no column {col_path!r} — quarantine")
    if "." in col_path:
        # a dotted path means the column lives under a nested group:
        # its definition/repetition levels are multi-bit and this flat
        # reader would decode them WRONG, not just slowly
        raise ValueError("parquet: nested columns unsupported — quarantine")
    sch = next(
        (s for s in foot["schema"]
         if s["name"] == col_path and not s.get("num_children")),
        None,
    )
    if sch is None:
        raise ValueError(f"parquet: no flat schema leaf {col_path!r}")
    if sch.get("repetition") == 2:
        raise ValueError("parquet: repeated fields unsupported — quarantine")
    optional = sch.get("repetition") != 0
    return _read_pages(blob, col, optional)


def read_column_ranged(
    path: str, foot: dict, rg_idx: int, col_path: str
) -> list:
    """Ranged variant of read_column: seeks to the one column chunk's
    byte span (``total_compressed_size`` bytes from the chunk's first
    page) and decodes only those bytes.  This is the access pattern a
    distributed scan task must have — it holds one chunk, never the
    whole file."""
    rg = foot["row_groups"][rg_idx]
    col = next((c for c in rg["columns"] if c["path"] == col_path), None)
    if col is None:
        raise ValueError(f"parquet: no column {col_path!r} — quarantine")
    if "." in col_path:
        raise ValueError("parquet: nested columns unsupported — quarantine")
    sch = next(
        (s for s in foot["schema"]
         if s["name"] == col_path and not s.get("num_children")),
        None,
    )
    if sch is None:
        raise ValueError(f"parquet: no flat schema leaf {col_path!r}")
    if sch.get("repetition") == 2:
        raise ValueError("parquet: repeated fields unsupported — quarantine")
    optional = sch.get("repetition") != 0
    start = col["data_page_offset"]
    if col.get("dictionary_page_offset"):
        start = min(start, col["dictionary_page_offset"])
    length = col["total_compressed_size"]
    if length is None or start is None:
        raise ValueError("parquet: chunk span missing from footer")
    with open(path, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(length)
    if len(chunk) < length:
        raise ValueError("parquet: chunk overruns file — quarantine")
    return _read_pages(chunk, col, optional, base=start)


def read_all_columns(blob: bytes, col_path: str) -> list:
    """One column across every row group, in row order."""
    foot = parse_parquet_footer(blob)
    out: list = []
    for i in range(len(foot["row_groups"])):
        out.extend(read_column(blob, i, col_path))
    return out
