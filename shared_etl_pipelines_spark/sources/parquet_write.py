"""Parquet WRITER from raw bytes — the symmetric half of
sources/parquet_pages.py: a Thrift compact-protocol ENCODER plus v1
data pages, making the repo's parquet path independent in both
directions. The cross-check inverts: files written here must read back
value-identically through pyarrow AND DuckDB (two independent
reference readers).

Scope: flat schemas of int64 / double / utf8 / boolean, optional
fields (definition levels via the RLE hybrid), PLAIN and dictionary
encodings (r12: PLAIN dictionary pages + RLE/bit-packed indices),
configurable row-group size, UNCOMPRESSED / SNAPPY / ZSTD codecs (all
three through the repo's own compressors), UTF8 converted-type
annotation so strings read back as strings, and min/max/null-count
statistics.
"""

from __future__ import annotations

import struct

__all__ = ["write_parquet"]

# ----------------------------------------------------------------------
# thrift compact ENCODER (structs, i32/i64 zigzag, binary, lists, bool)
# ----------------------------------------------------------------------


def _uvar(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> bytes:
    return _uvar((v << 1) ^ (v >> 63))


class _TStruct:
    """Builds one compact-protocol struct; fields must be added in
    ascending field-id order (delta encoding)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.last = 0

    def _hdr(self, fid: int, wtype: int) -> None:
        delta = fid - self.last
        if 0 < delta < 16:
            self.out.append((delta << 4) | wtype)
        else:
            self.out.append(wtype)
            self.out += _zz(fid)
        self.last = fid

    def i32(self, fid: int, v: int) -> "_TStruct":
        self._hdr(fid, 5)
        self.out += _zz(v)
        return self

    def i64(self, fid: int, v: int) -> "_TStruct":
        self._hdr(fid, 6)
        self.out += _zz(v)
        return self

    def binary(self, fid: int, v: bytes) -> "_TStruct":
        self._hdr(fid, 8)
        self.out += _uvar(len(v)) + v
        return self

    def boolean(self, fid: int, v: bool) -> "_TStruct":
        self._hdr(fid, 1 if v else 2)
        return self

    def list_i32(self, fid: int, vals: list[int]) -> "_TStruct":
        self._hdr(fid, 9)
        n = len(vals)
        if n < 15:
            self.out.append((n << 4) | 5)
        else:
            self.out.append(0xF0 | 5)
            self.out += _uvar(n)
        for v in vals:
            self.out += _zz(v)
        return self

    def list_i64(self, fid: int, vals: list[int]) -> "_TStruct":
        self._hdr(fid, 9)
        n = len(vals)
        if n < 15:
            self.out.append((n << 4) | 6)
        else:
            self.out.append(0xF0 | 6)
            self.out += _uvar(n)
        for v in vals:
            self.out += _zz(v)
        return self

    def list_bool(self, fid: int, vals: list[bool]) -> "_TStruct":
        # compact spec: bool list elements are one byte each, 1/2
        self._hdr(fid, 9)
        n = len(vals)
        if n < 15:
            self.out.append((n << 4) | 1)
        else:
            self.out.append(0xF0 | 1)
            self.out += _uvar(n)
        for v in vals:
            self.out.append(1 if v else 2)
        return self

    def list_binary(self, fid: int, vals: list[bytes]) -> "_TStruct":
        self._hdr(fid, 9)
        n = len(vals)
        if n < 15:
            self.out.append((n << 4) | 8)
        else:
            self.out.append(0xF0 | 8)
            self.out += _uvar(n)
        for v in vals:
            self.out += _uvar(len(v)) + v
        return self

    def list_struct(self, fid: int, vals: list[bytes]) -> "_TStruct":
        self._hdr(fid, 9)
        n = len(vals)
        if n < 15:
            self.out.append((n << 4) | 12)
        else:
            self.out.append(0xF0 | 12)
            self.out += _uvar(n)
        for v in vals:
            self.out += v
        return self

    def struct(self, fid: int, v: bytes) -> "_TStruct":
        self._hdr(fid, 12)
        self.out += v
        return self

    def done(self) -> bytes:
        return bytes(self.out) + b"\x00"


# ----------------------------------------------------------------------
# value + level encoding
# ----------------------------------------------------------------------
_TYPES = {"int64": 2, "double": 5, "utf8": 6, "boolean": 0}


def _rle_levels_raw(defs: list[int]) -> bytes:
    """Definition levels as one RLE run per value change (bit width 1),
    WITHOUT the v1 length prefix — the v2 page form."""
    body = bytearray()
    i = 0
    while i < len(defs):
        j = i
        while j < len(defs) and defs[j] == defs[i]:
            j += 1
        body += _uvar((j - i) << 1)
        body.append(defs[i])
        i = j
    return bytes(body)


def _rle_def_levels(defs: list[int]) -> bytes:
    """v1 form: 4-byte length prefix + the RLE runs."""
    body = _rle_levels_raw(defs)
    return struct.pack("<I", len(body)) + body


def _rle_hybrid(vals: list[int], width: int) -> bytes:
    """RLE / bit-packed hybrid for dictionary indices: runs >= 8 become
    RLE runs, everything else bit-packs in groups of 8 values (a
    partial final group pads with zero indices, which the reader never
    consumes past num_values; a partial group NOT at the end is spilled
    as single-value RLE runs instead, since its padding would shift
    real values)."""
    nbytes = (width + 7) // 8
    body = bytearray()
    i, n = 0, len(vals)
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        if j - i >= 8:
            body += _uvar((j - i) << 1)
            body += vals[i].to_bytes(nbytes, "little")
            i = j
            continue
        # collect a bit-pack segment up to the next >=8 run
        k = i
        while k < n:
            j2 = k
            while j2 < n and vals[j2] == vals[k]:
                j2 += 1
            if j2 - k >= 8:
                break
            k = j2
        seg = vals[i:k]
        at_end = k >= n
        full = len(seg) if at_end else (len(seg) // 8) * 8
        if full:
            groups = (full + 7) // 8
            body += _uvar((groups << 1) | 1)
            acc = bits = 0
            padded = seg[:full] + [0] * (groups * 8 - full)
            for v in padded:
                acc |= v << bits
                bits += width
                while bits >= 8:
                    body.append(acc & 0xFF)
                    acc >>= 8
                    bits -= 8
        for v in seg[full:]:  # mid-stream remainder: 1-value RLE runs
            body += _uvar(1 << 1)
            body += v.to_bytes(nbytes, "little")
        i = k
    return bytes(body)


# ----------------------------------------------------------------------
# alternative value encodings (r13): the WRITE half of the decoders in
# sources/parquet_pages.py — DELTA_BINARY_PACKED (block 128, 4
# miniblocks), DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY (shared-prefix
# suffixes), BYTE_STREAM_SPLIT
# ----------------------------------------------------------------------
def _uleb_w(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_leb_w(v: int) -> bytes:
    return _uleb_w((v << 1) ^ (v >> 63))


def _delta_bp_write(vals: list[int]) -> bytes:
    """DELTA_BINARY_PACKED: ULEB header (block 128, 4 miniblocks of 32,
    count, zigzag first), per block a zigzag min-delta + 4 bit widths +
    LSB-first packed adjusted deltas; trailing miniblocks pad width 0."""
    out = bytearray(_uleb_w(128) + _uleb_w(4) + _uleb_w(len(vals)))
    out += _zz_leb_w(vals[0] if vals else 0)
    deltas = [vals[i] - vals[i - 1] for i in range(1, len(vals))]
    for bs in range(0, len(deltas), 128):
        block = deltas[bs : bs + 128]
        min_d = min(block)
        adj = [d - min_d for d in block] + [0] * (128 - len(block))
        out += _zz_leb_w(min_d)
        widths = []
        for m in range(4):
            mini = adj[32 * m : 32 * (m + 1)]
            n_vals_here = max(0, min(32, len(block) - 32 * m))
            widths.append(
                max((x.bit_length() for x in mini[:n_vals_here]),
                    default=0) if n_vals_here else 0
            )
        out += bytes(widths)
        for m, w in enumerate(widths):
            # width-0 miniblocks (padding or all-equal deltas) carry no
            # payload bytes
            if w:
                bits = 0
                for i, x in enumerate(adj[32 * m : 32 * (m + 1)]):
                    bits |= x << (i * w)
                out += bits.to_bytes((32 * w + 7) // 8, "little")
    return bytes(out)


def _delta_length_write(vals: list[bytes]) -> bytes:
    return _delta_bp_write([len(v) for v in vals]) + b"".join(vals)


def _delta_byte_array_write(vals: list[bytes]) -> bytes:
    prefixes: list[int] = []
    suffixes: list[bytes] = []
    prev = b""
    for v in vals:
        n = 0
        m = min(len(prev), len(v))
        while n < m and prev[n] == v[n]:
            n += 1
        prefixes.append(n)
        suffixes.append(v[n:])
        prev = v
    return _delta_bp_write(prefixes) + _delta_length_write(suffixes)


def _byte_stream_split_write(vals: list, kind: str) -> bytes:
    fmt, k = ("<q", 8) if kind == "int64" else ("<d", 8)
    raws = [struct.pack(fmt, v) for v in vals]
    return bytes(r[j] for j in range(k) for r in raws)


# column-override encodings: name -> (parquet id, allowed kinds)
_ALT_ENCODINGS = {
    "DELTA_BINARY_PACKED": (5, ("int64",)),
    "DELTA_LENGTH_BYTE_ARRAY": (6, ("utf8",)),
    "DELTA_BYTE_ARRAY": (7, ("utf8",)),
    # the spec extends BSS to ints, but DuckDB's reader accepts only
    # FLOAT/DOUBLE — keep the three-reader contract
    "BYTE_STREAM_SPLIT": (9, ("double",)),
}


def _alt_encode(vals: list, kind: str, name: str) -> bytes:
    if name == "DELTA_BINARY_PACKED":
        return _delta_bp_write(vals)
    if name == "DELTA_LENGTH_BYTE_ARRAY":
        return _delta_length_write([v.encode("utf-8") for v in vals])
    if name == "DELTA_BYTE_ARRAY":
        return _delta_byte_array_write([v.encode("utf-8") for v in vals])
    return _byte_stream_split_write(vals, kind)


def _plain(vals: list, kind: str) -> bytes:
    if kind == "int64":
        return struct.pack(f"<{len(vals)}q", *vals)
    if kind == "double":
        return struct.pack(f"<{len(vals)}d", *vals)
    if kind == "boolean":
        out = bytearray((len(vals) + 7) // 8)
        for i, v in enumerate(vals):
            if v:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)
    out = bytearray()
    for v in vals:
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out += struct.pack("<I", len(b)) + b
    return bytes(out)


def _stat_bytes(v, kind: str) -> bytes:
    if kind == "int64":
        return struct.pack("<q", v)
    if kind == "double":
        return struct.pack("<d", v)
    if kind == "boolean":
        return bytes([1 if v else 0])
    return v.encode("utf-8") if isinstance(v, str) else bytes(v)


def write_parquet(
    columns: list[tuple[str, str, list]],
    compression: str = "SNAPPY",
    row_group_size: int = 1 << 20,
    use_dictionary: bool = False,
    page_rows: int | None = None,
    write_page_index: bool = False,
    page_version: int = 1,
    zstd_matches: bool = False,
    column_encodings: dict[str, str] | None = None,
) -> bytes:
    """``columns``: (name, kind in int64/double/utf8/boolean, values
    with None for nulls). Returns the complete file bytes.

    ``use_dictionary=True`` (r12) dictionary-encodes any non-boolean
    chunk whose distinct-value count is below both 65536 and the
    present-value count: a PLAIN dictionary page followed by v1 data
    pages of RLE/bit-packed PLAIN_DICTIONARY indices — the layout that
    makes repeated-string corpora shrink, and the one the repo's own
    reader, pyarrow and DuckDB all decode.

    ``page_rows`` (r12) splits each column chunk into multiple data
    pages of that many rows; ``write_page_index=True`` then emits the
    spec's ColumnIndex/OffsetIndex sections (per-page null flags,
    min/max, null counts, byte spans, first row indexes) between the
    data and the footer, so page-pruned scans
    (sources/parquet_pageindex.py) work on files this writer emits.

    ``page_version=2`` (r12) emits DataPageHeaderV2 pages: definition
    levels stored uncompressed ahead of the (separately compressed)
    values, their byte length carried in the header instead of the v1
    inline prefix.

    ``list<int64>`` / ``list<double>`` kinds (r13) emit the spec's
    3-level LIST encoding (optional group LIST > repeated group list >
    required element): values are Python lists (None for a null list,
    [] for an empty one; null ELEMENTS refuse loudly), levels are
    max_rep 1 / max_def 2, pages split on record boundaries. Page
    indexes are not defined for this writer's list chunks and refuse."""
    if page_version not in (1, 2):
        raise ValueError("parquet writer: page_version must be 1 or 2")
    if write_page_index and any(k.startswith("list<") for _n, k, _v in columns):
        raise ValueError(
            "parquet writer: page indexes for list columns unsupported — "
            "quarantine"
        )
    # column_encodings (r13): per-column alternative value encodings —
    # DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY /
    # BYTE_STREAM_SPLIT; validated against the column kind up front
    kind_by_name = {n: k for n, k, _v in columns}
    for cname, ename in (column_encodings or {}).items():
        if cname not in kind_by_name:
            raise ValueError(
                f"parquet writer: encoding for unknown column {cname!r}"
            )
        if ename not in _ALT_ENCODINGS:
            raise ValueError(
                f"parquet writer: encoding {ename} unsupported — quarantine"
            )
        if kind_by_name[cname] not in _ALT_ENCODINGS[ename][1]:
            raise ValueError(
                f"parquet writer: encoding {ename} invalid for kind "
                f"{kind_by_name[cname]} — quarantine"
            )
    if compression not in ("UNCOMPRESSED", "SNAPPY", "ZSTD"):
        raise ValueError(f"parquet writer: codec {compression} unsupported")
    codec_id = {"UNCOMPRESSED": 0, "SNAPPY": 1, "ZSTD": 6}[compression]
    n_rows_total = len(columns[0][2]) if columns else 0
    for _n, _k, vals in columns:
        if len(vals) != n_rows_total:
            raise ValueError("parquet writer: ragged columns")

    def _compress(body: bytes) -> bytes:
        if compression == "SNAPPY":
            from shared_etl_pipelines_spark.sources.snappy import (
                snappy_compress,
            )

            return snappy_compress(body)
        if compression == "ZSTD":
            from shared_etl_pipelines_spark.sources.zstd_encode import (
                zstd_compress,
            )

            # zstd_matches (r13): predefined-FSE compressed blocks for
            # real ratio; default stays store mode
            return zstd_compress(body, matches=zstd_matches)
        return body

    out = bytearray(b"PAR1")
    # chunk records: everything the footer + page indexes need, built
    # while the data section is written
    rg_records: list[tuple[int, list[dict]]] = []  # (n_rows, chunks)
    for rg_start in range(0, max(n_rows_total, 1), row_group_size):
        if rg_start >= n_rows_total and n_rows_total:
            break
        rg_vals = [
            (name, kind, vals[rg_start : rg_start + row_group_size])
            for name, kind, vals in columns
        ]
        n_rows = len(rg_vals[0][2]) if rg_vals else 0
        chunks: list[dict] = []
        for name, kind, vals in rg_vals:
            is_list = kind.startswith("list<")
            ekind = kind[5:-1] if is_list else kind
            if is_list and ekind not in ("int64", "double"):
                raise ValueError(
                    f"parquet writer: list element kind {ekind} "
                    "unsupported — quarantine"
                )
            present = [v for v in vals if v is not None]
            if is_list and any(
                e is None for v in present for e in v
            ):
                raise ValueError(
                    "parquet writer: null LIST ELEMENTS unsupported "
                    "(3-level encoding here is required-element) — "
                    "quarantine"
                )

            alt_enc = (column_encodings or {}).get(name)

            dct: list | None = None
            seen: dict = {}
            # doubles key on the raw bit pattern: Python equality folds
            # -0.0 into 0.0 (and splits NaN from itself), so keying on
            # the value would break the value-identical readback
            # contract for columns holding both zero signs
            if ekind == "double":
                def _dkey(v: float) -> bytes:
                    return struct.pack("<d", v)
            else:
                def _dkey(v):
                    return v
            if (use_dictionary and kind != "boolean" and not is_list
                    and alt_enc is None and present):
                uniq: list = []
                for v in present:
                    k = _dkey(v)
                    if k not in seen:
                        seen[k] = len(seen)
                        uniq.append(v)
                if len(seen) < len(present) and len(seen) <= 65536:
                    dct = uniq

            stats = _TStruct()
            stats.i64(3, len(vals) - len(present))
            if present and not is_list:
                stats.binary(5, _stat_bytes(max(present), kind))
                stats.binary(6, _stat_bytes(min(present), kind))

            chunk_off = len(out)
            dict_off = None
            usize_total = csize_total = 0
            if dct is not None:
                dbody = _plain(dct, kind)
                dcomp = _compress(dbody)
                dict_hdr = (
                    _TStruct()
                    .i32(1, 2)  # DICTIONARY_PAGE
                    .i32(2, len(dbody))
                    .i32(3, len(dcomp))
                    .struct(
                        7,
                        _TStruct()
                        .i32(1, len(dct))
                        # v1 keeps the PLAIN_DICTIONARY convention; v2
                        # files advertise PLAIN for the dict page per the
                        # spec's deprecation note
                        .i32(2, 2 if page_version == 1 else 0)
                        .done(),
                    )
                    .done()
                )
                dict_off = len(out)
                out += dict_hdr
                out += dcomp
                usize_total += len(dict_hdr) + len(dbody)
                csize_total += len(dict_hdr) + len(dcomp)
                width = max(1, (len(dct) - 1).bit_length())
                # the spec deprecates PLAIN_DICTIONARY for new files;
                # V2 pages carry RLE_DICTIONARY (8), V1 keeps the
                # legacy code every reader accepts
                enc = 2 if page_version == 1 else 8
            else:
                enc = 0  # PLAIN

            pages: list[dict] = []
            step = page_rows if page_rows else max(len(vals), 1)
            first = 0
            total_levels = 0
            while True:
                pv = vals[first : first + step]
                if not pv and (first or n_rows):
                    break
                if is_list:
                    # 3-level LIST levels per record: null list -> def 0,
                    # empty -> def 1, elements -> def 2; rep 0 opens a
                    # record, rep 1 continues its list
                    defs: list[int] = []
                    reps: list[int] = []
                    ppresent = []
                    for rec in pv:
                        if rec is None:
                            defs.append(0)
                            reps.append(0)
                        elif not len(rec):
                            defs.append(1)
                            reps.append(0)
                        else:
                            for j, e in enumerate(rec):
                                defs.append(2)
                                reps.append(1 if j else 0)
                                ppresent.append(e)
                else:
                    defs = [0 if v is None else 1 for v in pv]
                    reps = []
                    ppresent = [v for v in pv if v is not None]
                total_levels += len(defs)
                if dct is not None:
                    vals_part = bytes([width]) + _rle_hybrid(
                        [seen[_dkey(v)] for v in ppresent], width
                    )
                elif alt_enc is not None:
                    vals_part = _alt_encode(ppresent, ekind, alt_enc)
                    enc = _ALT_ENCODINGS[alt_enc][0]
                else:
                    vals_part = _plain(ppresent, ekind)
                max_def = 2 if is_list else 1
                if page_version == 2:
                    rep_raw = _rle_levels_raw(reps) if is_list else b""
                    levels = _rle_levels_raw(defs)
                    vcomp = _compress(vals_part)
                    body = rep_raw + levels + vcomp
                    usize_body = len(rep_raw) + len(levels) + len(vals_part)
                    dph2 = (
                        _TStruct()
                        .i32(1, len(defs))
                        .i32(2, sum(1 for d in defs if d < max_def))
                        .i32(3, len(pv))
                        .i32(4, enc)
                        .i32(5, len(levels))
                        .i32(6, len(rep_raw))
                        .boolean(7, compression != "UNCOMPRESSED")
                        .done()
                    )
                    page_hdr = (
                        _TStruct()
                        .i32(1, 3)  # DATA_PAGE_V2
                        .i32(2, usize_body)
                        .i32(3, len(body))
                        .struct(8, dph2)
                        .done()
                    )
                    comp = body
                    body_len_for_meta = usize_body
                else:
                    body = (
                        (_rle_def_levels(reps) if is_list else b"")
                        + _rle_def_levels(defs)
                        + vals_part
                    )
                    comp = _compress(body)
                    body_len_for_meta = len(body)
                    dph = (
                        _TStruct()
                        .i32(1, len(defs))
                        .i32(2, enc)
                        .i32(3, 3)  # def levels: RLE
                        .i32(4, 3)  # rep levels: RLE
                        .done()
                    )
                    page_hdr = (
                        _TStruct()
                        .i32(1, 0)  # DATA_PAGE
                        .i32(2, len(body))
                        .i32(3, len(comp))
                        .struct(5, dph)
                        .done()
                    )
                page_off = len(out)
                out += page_hdr
                out += comp
                usize_total += len(page_hdr) + body_len_for_meta
                csize_total += len(page_hdr) + len(comp)
                pages.append(
                    {
                        "offset": page_off,
                        "size": len(page_hdr) + len(comp),
                        "first_row": first,
                        "null_page": not ppresent,
                        "null_count": sum(1 for d in defs if d < max_def),
                        "min": _stat_bytes(min(ppresent), ekind)
                        if ppresent and not is_list else b"",
                        "max": _stat_bytes(max(ppresent), ekind)
                        if ppresent and not is_list else b"",
                    }
                )
                first += len(pv)
                if first >= len(vals):
                    break
            chunks.append(
                {
                    "name": name,
                    "kind": ekind,
                    "path": (
                        [name, "list", "element"] if is_list else [name]
                    ),
                    "enc": enc,
                    "dct": dct is not None,
                    "n_vals": total_levels if is_list else len(vals),
                    "usize": usize_total,
                    "csize": csize_total,
                    "chunk_off": chunk_off,
                    "data_off": pages[0]["offset"],
                    "dict_off": dict_off,
                    "stats": stats.done(),
                    "pages": pages,
                }
            )
        rg_records.append((n_rows, chunks))
        if n_rows_total == 0:
            break

    if write_page_index:
        # spec layout: all ColumnIndex blocks, then all OffsetIndex
        # blocks, between the last data byte and the footer
        for _n_rows, chunks in rg_records:
            for ch in chunks:
                pages = ch["pages"]
                vals_present = [p for p in pages]
                mins = [p["min"] for p in pages]
                maxs = [p["max"] for p in pages]
                nonnull = [
                    (p["min"], p["max"]) for p in pages if not p["null_page"]
                ]
                if nonnull == sorted(nonnull):
                    order = 1  # ASCENDING
                elif nonnull == sorted(nonnull, reverse=True):
                    order = 2  # DESCENDING
                else:
                    order = 0
                ci = (
                    _TStruct()
                    .list_bool(1, [p["null_page"] for p in pages])
                    .list_binary(2, mins)
                    .list_binary(3, maxs)
                    .i32(4, order)
                    .list_i64(5, [p["null_count"] for p in pages])
                    .done()
                )
                ch["column_index_offset"] = len(out)
                ch["column_index_length"] = len(ci)
                out += ci
        for _n_rows, chunks in rg_records:
            for ch in chunks:
                locs = [
                    _TStruct()
                    .i64(1, p["offset"])
                    .i32(2, p["size"])
                    .i64(3, p["first_row"])
                    .done()
                    for p in ch["pages"]
                ]
                oi = _TStruct().list_struct(1, locs).done()
                ch["offset_index_offset"] = len(out)
                ch["offset_index_length"] = len(oi)
                out += oi

    rg_metas: list[bytes] = []
    for n_rows, chunks in rg_records:
        col_metas: list[bytes] = []
        rg_bytes = 0
        for ch in chunks:
            cmd = (
                _TStruct()
                .i32(1, _TYPES[ch["kind"]])
                .list_i32(2, [ch["enc"], 3] if not ch["dct"]
                          else [ch["enc"], 0, 3])
                .list_binary(3, [p.encode() for p in ch["path"]])
                .i32(4, codec_id)
                .i64(5, ch["n_vals"])
                .i64(6, ch["usize"])
                .i64(7, ch["csize"])
                .i64(9, ch["data_off"])
            )
            if ch["dict_off"] is not None:
                cmd.i64(11, ch["dict_off"])
            cmd = cmd.struct(12, ch["stats"]).done()
            cm = _TStruct().i64(2, ch["chunk_off"]).struct(3, cmd)
            if "offset_index_offset" in ch:
                cm.i64(4, ch["offset_index_offset"])
                cm.i32(5, ch["offset_index_length"])
                cm.i64(6, ch["column_index_offset"])
                cm.i32(7, ch["column_index_length"])
            col_metas.append(cm.done())
            rg_bytes += ch["csize"]
        rg_metas.append(
            _TStruct()
            .list_struct(1, col_metas)
            .i64(2, rg_bytes)
            .i64(3, n_rows)
            .done()
        )

    schema_elems = [
        _TStruct()
        .binary(4, b"schema")
        .i32(5, len(columns))
        .done()
    ]
    for name, kind, _vals in columns:
        if kind.startswith("list<"):
            # 3-level group: optional LIST > repeated "list" >
            # required "element"
            schema_elems.append(
                _TStruct()
                .i32(3, 1)  # OPTIONAL
                .binary(4, name.encode())
                .i32(5, 1)
                .i32(6, 3)  # ConvertedType LIST
                .done()
            )
            schema_elems.append(
                _TStruct()
                .i32(3, 2)  # REPEATED
                .binary(4, b"list")
                .i32(5, 1)
                .done()
            )
            schema_elems.append(
                _TStruct()
                .i32(1, _TYPES[kind[5:-1]])
                .i32(3, 0)  # REQUIRED
                .binary(4, b"element")
                .done()
            )
            continue
        el = (
            _TStruct()
            .i32(1, _TYPES[kind])
            .i32(3, 1)  # OPTIONAL
            .binary(4, name.encode())
        )
        if kind == "utf8":
            el.i32(6, 0)  # ConvertedType UTF8: read back as string
        schema_elems.append(el.done())
    fmd = (
        _TStruct()
        .i32(1, 2)  # version
        .list_struct(2, schema_elems)
        .i64(3, n_rows_total)
        .list_struct(4, rg_metas)
        .binary(6, b"shared-etl-pipelines-spark parquet writer")
        .done()
    )
    flen = len(fmd)
    out += fmd
    out += struct.pack("<I", flen)
    out += b"PAR1"
    return bytes(out)
