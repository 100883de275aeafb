"""Parquet PAGE INDEXES (ColumnIndex / OffsetIndex) + page-pruned
ranged scans — the page-level half of predicate pushdown.

Row-group pruning (sources/parquet_footer.py stats) skips whole row
groups; the page index (parquet.thrift ColumnIndex: per-page null
flags/min/max/null counts; OffsetIndex: per-page byte spans and first
row indexes) lets a scan skip PAGES inside a row group it must
otherwise read — on a 100 TB table with 1 Mi-row groups and 4 KiB
pages that is the difference between reading ~250 pages and the 2-3
whose [min,max] intersect the predicate. ``read_column_pruned`` does
exactly that with ranged reads: footer tail, the two index spans, the
dictionary page, then ONLY the selected pages' byte spans.

Cross-check: the indexes parsed here are written by pyarrow
(write_page_index=True) — an independent reference implementation —
and the pruned scan must return exactly what a full scan filtered
post-hoc returns (tests/test_parquet_pageindex.py).
"""

from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.parquet_footer import (
    parse_parquet_footer,
)
from shared_etl_pipelines_spark.sources.parquet_pages import (
    _decode_values,
    _decompress,
    _plain_values,
    _rle_bitpacked,
)
from shared_etl_pipelines_spark.sources.thrift_compact import decode_struct

__all__ = [
    "read_page_indexes",
    "read_column_pruned",
    "read_column_rows",
    "read_all_pruned",
]


def _plain_one(v: bytes | None, ptype: str):
    if v is None:
        return None
    if ptype == "INT32":
        return struct.unpack("<i", v)[0]
    if ptype == "INT64":
        return struct.unpack("<q", v)[0]
    if ptype == "DOUBLE":
        return struct.unpack("<d", v)[0]
    if ptype == "FLOAT":
        return struct.unpack("<f", v)[0]
    if ptype == "BYTE_ARRAY":
        return v.decode("utf-8", "replace")
    return v.hex()


def read_page_indexes(path: str, foot: dict, rg_idx: int, col_path: str) -> dict:
    """ColumnIndex + OffsetIndex of one column chunk, via two ranged
    reads. Returns {pages: [{offset, size, first_row, min, max,
    null_page, null_count}], boundary_order}. Refuses when the writer
    emitted no page index."""
    rg = foot["row_groups"][rg_idx]
    col = next((c for c in rg["columns"] if c["path"] == col_path), None)
    if col is None:
        raise ValueError(f"parquet: no column {col_path!r} — quarantine")
    cio = col.get("column_index_offset")
    cil = col.get("column_index_length")
    oio = col.get("offset_index_offset")
    oil = col.get("offset_index_length")
    if cio is None or oio is None:
        raise ValueError(
            "parquet: no page index for this chunk (writer did not emit "
            "one) — quarantine"
        )
    with open(path, "rb") as fh:
        fh.seek(cio)
        ci_raw = fh.read(cil)
        fh.seek(oio)
        oi_raw = fh.read(oil)
    if len(ci_raw) < cil or len(oi_raw) < oil:
        raise ValueError("parquet: page index overruns file — quarantine")
    ci, _ = decode_struct(ci_raw)
    oi, _ = decode_struct(oi_raw)
    null_pages = ci.get(1, [])
    mins = ci.get(2, [])
    maxs = ci.get(3, [])
    null_counts = ci.get(5, [])
    locs = oi.get(1, [])
    if not (len(null_pages) == len(mins) == len(maxs) == len(locs)):
        raise ValueError("parquet: page index arity mismatch — quarantine")
    ptype = col["type"]
    pages = []
    for i, loc in enumerate(locs):
        is_null = bool(null_pages[i])
        pages.append(
            {
                "offset": loc.get(1),
                "size": loc.get(2),
                "first_row": loc.get(3),
                # spec: min/max of an all-null page are undefined bytes
                "min": None if is_null else _plain_one(mins[i], ptype),
                "max": None if is_null else _plain_one(maxs[i], ptype),
                "null_page": is_null,
                "null_count": null_counts[i] if i < len(null_counts) else None,
            }
        )
    return {"pages": pages, "boundary_order": ci.get(4)}


def _decode_page_span(
    span: bytes, codec: str, ptype: str, optional: bool, dictionary
) -> list:
    """Decode exactly one v1/v2 data page located at the start of
    ``span`` (the OffsetIndex byte range)."""
    hdr, q = decode_struct(span)
    page_type = hdr.get(1)
    usize = hdr.get(2)
    csize = hdr.get(3)
    body = span[q : q + csize]
    if len(body) < csize:
        raise ValueError("parquet: page overruns its index span — quarantine")
    if page_type == 0:  # v1
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
        return _decode_values(raw, r, enc, ptype, defs, dictionary)
    if page_type == 3:  # v2
        dph = hdr.get(8, {})
        n_vals = dph.get(1)
        enc = dph.get(4)
        dl_len = dph.get(5, 0)
        rl_len = dph.get(6, 0)
        is_comp = dph.get(7, True)
        if rl_len:
            raise ValueError("parquet: repeated fields unsupported")
        levels = body[:dl_len]
        vals_part = body[dl_len + rl_len :]
        if is_comp:
            vals_part = _decompress(vals_part, codec, usize - dl_len - rl_len)
        defs = (
            _rle_bitpacked(levels, 0, 1, n_vals)[0]
            if optional and dl_len
            else [1] * n_vals
        )
        return _decode_values(vals_part, 0, enc, ptype, defs, dictionary)
    raise ValueError(
        f"parquet: page type {page_type} at an OffsetIndex location"
    )


def read_column_pruned(
    path: str, foot: dict, rg_idx: int, col_path: str, lo, hi
) -> tuple[list[tuple[int, object]], int, int]:
    """Values of one column restricted to pages whose [min, max]
    intersects [lo, hi] — each selected page fetched by its OffsetIndex
    byte span, never the whole chunk. Returns
    ((first_row_index, value) pairs in row order, pages_total,
    pages_read). Values outside [lo, hi] from partially-matching pages
    ARE included (page granularity); nulls decode as None."""
    rg = foot["row_groups"][rg_idx]
    col = next(c for c in rg["columns"] if c["path"] == col_path)
    sch = next(
        (s for s in foot["schema"]
         if s["name"] == col_path and not s.get("num_children")),
        None,
    )
    if sch is None or "." in col_path:
        raise ValueError("parquet: nested columns unsupported — quarantine")
    optional = sch.get("repetition") != 0
    idx = read_page_indexes(path, foot, rg_idx, col_path)
    pages = idx["pages"]
    chosen = [
        p for p in pages
        if not p["null_page"]
        and not (p["max"] < lo or p["min"] > hi)
    ]
    dictionary = None
    dpo = col.get("dictionary_page_offset")
    if dpo is not None and pages:
        # the dictionary page sits between the chunk start and the
        # first data page — one ranged read covers it exactly
        first_data = min(p["offset"] for p in pages)
        with open(path, "rb") as fh:
            fh.seek(dpo)
            dspan = fh.read(first_data - dpo)
        hdr, q = decode_struct(dspan)
        if hdr.get(1) != 2:
            raise ValueError("parquet: dictionary offset is not a dict page")
        raw = _decompress(
            dspan[q : q + hdr.get(3)], col["codec"], hdr.get(2)
        )
        dictionary = _plain_values(raw, 0, col["type"], hdr.get(7, {}).get(1, 0))
    out: list[tuple[int, object]] = []
    with open(path, "rb") as fh:
        for p in chosen:
            fh.seek(p["offset"])
            span = fh.read(p["size"])
            if len(span) < p["size"]:
                raise ValueError("parquet: page span overruns file")
            vals = _decode_page_span(
                span, col["codec"], col["type"], optional, dictionary
            )
            out.extend((p["first_row"] + i, v) for i, v in enumerate(vals))
    return out, len(pages), len(chosen)


def read_all_pruned(
    path: str, col_path: str, lo, hi
) -> tuple[list[tuple[int, object]], int, int]:
    """read_column_pruned across every row group (row indexes are
    global: first_row_index is row-group-relative per spec, offset by
    the group's starting row here)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    foot = parse_parquet_footer(blob)
    out: list[tuple[int, object]] = []
    total = read_ = 0
    base = 0
    for gi, rg in enumerate(foot["row_groups"]):
        vals, n_t, n_r = read_column_pruned(path, foot, gi, col_path, lo, hi)
        out.extend((base + r, v) for r, v in vals)
        total += n_t
        read_ += n_r
        base += rg["num_rows"]
    return out, total, read_


def read_column_rows(
    path: str, foot: dict, rg_idx: int, col_path: str,
    row_lo: int, row_hi: int,
) -> tuple[list[tuple[int, object]], int, int]:
    """Companion-column fetch: values of the pages covering row indexes
    [row_lo, row_hi] (row-group-relative), selected by the OffsetIndex
    first_row spans — how a reader aligns a second column to the rows a
    predicate column already selected, without re-reading the chunk."""
    rg = foot["row_groups"][rg_idx]
    col = next(c for c in rg["columns"] if c["path"] == col_path)
    sch = next(
        (s for s in foot["schema"]
         if s["name"] == col_path and not s.get("num_children")),
        None,
    )
    if sch is None or "." in col_path:
        raise ValueError("parquet: nested columns unsupported — quarantine")
    optional = sch.get("repetition") != 0
    idx = read_page_indexes(path, foot, rg_idx, col_path)
    pages = idx["pages"]
    n_rows_rg = rg["num_rows"]
    chosen = []
    for i, p in enumerate(pages):
        nxt = pages[i + 1]["first_row"] if i + 1 < len(pages) else n_rows_rg
        if p["first_row"] <= row_hi and nxt - 1 >= row_lo:
            chosen.append(p)
    dictionary = None
    dpo = col.get("dictionary_page_offset")
    if dpo is not None and pages:
        first_data = min(p["offset"] for p in pages)
        with open(path, "rb") as fh:
            fh.seek(dpo)
            dspan = fh.read(first_data - dpo)
        hdr, q = decode_struct(dspan)
        if hdr.get(1) != 2:
            raise ValueError("parquet: dictionary offset is not a dict page")
        raw = _decompress(dspan[q : q + hdr.get(3)], col["codec"], hdr.get(2))
        dictionary = _plain_values(raw, 0, col["type"], hdr.get(7, {}).get(1, 0))
    out: list[tuple[int, object]] = []
    with open(path, "rb") as fh:
        for p in chosen:
            fh.seek(p["offset"])
            span = fh.read(p["size"])
            if len(span) < p["size"]:
                raise ValueError("parquet: page span overruns file")
            vals = _decode_page_span(
                span, col["codec"], col["type"], optional, dictionary
            )
            out.extend((p["first_row"] + i, v) for i, v in enumerate(vals))
    return out, len(pages), len(chosen)
