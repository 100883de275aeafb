"""ORC file-layout audit (the PUBLIC Apache ORC spec, orc.apache.org).

The second lakehouse column format after parquet: an intake audit must
read its TAIL — PostScript (uncompressed protobuf, its length in the
file's last byte) and Footer (protobuf, compressed with the file's
codec in 3-byte-header chunks) — to surface stripe layout, schema
tree, row counts and column statistics without touching stream data.
This module decodes that tail with the repo's own protobuf wire walk
(sources/tfrecord.py primitives; orc_proto.proto field numbers):

- PostScript: footerLength(1), compression(2), compressionBlockSize(3),
  version(4), metadataLength(5), writerVersion(6), magic(8000);
- Footer: headerLength(1), contentLength(2), stripes(3), types(4),
  numberOfRows(6), statistics(7), rowIndexStride(8);
- StripeInformation / Type / ColumnStatistics+IntegerStatistics.

Codec support is stated loudly: NONE and ZLIB (raw DEFLATE in the
spec's ``(len << 1) | isOriginal`` chunk framing) decode; SNAPPY /
LZO / LZ4 / ZSTD refuse by name — never guessed. Structural refusals
(bad magic, stripe overrun, row-count mismatch vs stripe sum,
truncated tail) all raise ValueError for the quarantine wrappers.

Stream payloads are OPAQUE here — this is the layout/stats audit a
storage planner runs (the parquet_layout_audit sibling); column
decode is out of scope and says so.
"""

from __future__ import annotations

import struct
import zlib

from shared_etl_pipelines_spark.sources.tfrecord import _fields, _varint


def _unzigzag(u: int) -> int:
    """sint64 decode (IntegerStatistics min/max/sum are sint64)."""
    return (u >> 1) ^ -(u & 1)

__all__ = ["encode_orc", "parse_orc_layout", "TYPE_KINDS", "COMPRESSION"]

COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD"}
TYPE_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long", 5: "float",
    6: "double", 7: "string", 8: "binary", 9: "timestamp", 10: "list",
    11: "map", 12: "struct", 13: "union", 14: "decimal", 15: "date",
    16: "varchar", 17: "char",
}
_KIND_NO = {v: k for k, v in TYPE_KINDS.items()}


# ----------------------------------------------------------------------
# protobuf encode helpers (write side exists for fixture control)
# ----------------------------------------------------------------------
def _kv(field_no: int, v: int) -> bytes:
    return _varint(field_no << 3) + _varint(v)


def _kd(field_no: int, body: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(body)) + body


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _stripe_info(offset: int, data_len: int, n_rows: int) -> bytes:
    return (
        _kv(1, offset) + _kv(2, 0) + _kv(3, data_len) + _kv(4, 0)
        + _kv(5, n_rows)
    )


def _type(kind: str, subtypes: list[int] = (), names: list[str] = ()) -> bytes:
    b = _kv(1, _KIND_NO[kind])
    for s in subtypes:
        b += _kv(2, s)
    for nm in names:
        b += _kd(3, nm.encode())
    return b


def _int_stats(n: int, lo: int, hi: int, total: int) -> bytes:
    ints = _kv(1, _zigzag(lo)) + _kv(2, _zigzag(hi)) + _kv(3, _zigzag(total))
    return _kv(1, n) + _kd(2, ints)


def _codec_chunks(
    body: bytes, kind: str, block: int = 262144,
    zstd_matches: bool = False,
) -> bytes:
    """Snappy/LZ4 chunk framing: same 3-byte header as ZLIB (the spec's
    generic compressed-stream chunking), codec applied per chunk; the
    original-flag path is taken when compression would not shrink.
    ``zstd_matches=True`` (r13) opts the ZSTD codec into the own
    encoder's predefined-FSE compressed blocks for real ratio."""
    if kind == "SNAPPY":
        from shared_etl_pipelines_spark.sources.snappy import snappy_compress as _c
    elif kind == "ZSTD":
        from shared_etl_pipelines_spark.sources.zstd_encode import zstd_compress

        def _c(b: bytes) -> bytes:
            return zstd_compress(b, matches=zstd_matches)
    else:
        from shared_etl_pipelines_spark.sources.lz4 import lz4_block_compress as _c
    out = bytearray()
    for pos in range(0, max(len(body), 1), block):
        chunk = body[pos : pos + block]
        if not chunk:
            break
        comp = _c(chunk)
        if len(comp) < len(chunk):
            out += (len(comp) << 1).to_bytes(3, "little") + comp
        else:
            out += ((len(chunk) << 1) | 1).to_bytes(3, "little") + chunk
    return bytes(out)


def _zlib_chunks(body: bytes, block: int = 262144) -> bytes:
    """Spec framing: 3-byte little-endian header (len << 1) | isOriginal
    per chunk; payload raw DEFLATE."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(body) + co.flush()
    if len(comp) >= len(body):  # the spec's isOriginal escape
        comp, orig = body, 1
    else:
        orig = 0
    head = struct.pack("<I", (len(comp) << 1) | orig)[:3]
    return head + comp


def encode_orc(
    columns: list[tuple[str, str]],
    stripe_rows: list[int],
    id_min: int,
    compression: str = "NONE",
    writer_version: int = 9,
) -> bytes:
    """Minimal spec-shaped ORC container: real header magic, opaque
    stripe payloads (8 bytes/row filler — layout audit never decodes
    streams), real protobuf Footer/PostScript tail. Column 0 is the
    root struct; ``columns`` are its children. Integer stats are
    attached to the first child as a contiguous id range starting at
    ``id_min``."""
    out = bytearray(b"ORC")
    stripes = b""
    off = 3
    for nr in stripe_rows:
        data_len = 8 * nr
        stripes += _kd(3, _stripe_info(off, data_len, nr))
        out += bytes((off + i) % 251 for i in range(data_len))
        off += data_len
    n_rows = sum(stripe_rows)
    types = _kd(
        4,
        _type(
            "struct",
            subtypes=list(range(1, len(columns) + 1)),
            names=[c[0] for c in columns],
        ),
    )
    for _, kind in columns:
        types += _kd(4, _type(kind))
    stats = _kd(7, _kv(1, n_rows))  # root struct statistics
    stats += _kd(7, _int_stats(n_rows, id_min, id_min + n_rows - 1,
                               sum(range(id_min, id_min + n_rows))))
    for _ in columns[1:]:
        stats += _kd(7, _kv(1, n_rows))
    footer = (
        # contentLength EXCLUDES the 3-byte magic (real-writer parity:
        # pyarrow's ORC files pin this interpretation)
        _kv(1, 3) + _kv(2, off - 3) + stripes + types + _kv(6, n_rows)
        + stats + _kv(8, 10000)
    )
    comp_no = {v: k for k, v in COMPRESSION.items()}[compression]
    if compression == "ZLIB":
        footer_bytes = _zlib_chunks(footer)
    elif compression == "SNAPPY":
        footer_bytes = _codec_chunks(footer, "SNAPPY")
    elif compression == "LZ4":
        footer_bytes = _codec_chunks(footer, "LZ4")
    elif compression == "ZSTD":
        footer_bytes = _codec_chunks(footer, "ZSTD")
    elif compression == "NONE":
        footer_bytes = footer
    else:
        raise ValueError(f"orc: no in-repo encoder for {compression}")
    ps = (
        _varint(1 << 3) + _varint(len(footer_bytes))
        + _kv(2, comp_no) + _kv(3, 262144)
        + _kv(4, 0) + _kv(4, 12)
        + _kv(5, 0) + _kv(6, writer_version)
        + _kd(8000, b"ORC")
    )
    if len(ps) > 255:
        raise ValueError("orc: postscript over one length byte")
    out += footer_bytes + ps + bytes([len(ps)])
    return bytes(out)


# ----------------------------------------------------------------------
# read side
# ----------------------------------------------------------------------
def _decompress_tail(blob: bytes, comp: int, codec_name: str) -> bytes:
    if comp == 0:
        return blob
    if comp not in (1, 2, 4, 5):
        raise ValueError(
            f"orc: no in-repo codec for {codec_name} tail — quarantine"
        )
    out = bytearray()
    pos = 0
    while pos < len(blob):
        if pos + 3 > len(blob):
            raise ValueError("orc: truncated compression chunk header")
        head = int.from_bytes(blob[pos : pos + 3], "little")
        n, orig = head >> 1, head & 1
        pos += 3
        if pos + n > len(blob):
            raise ValueError("orc: compression chunk overruns tail")
        chunk = blob[pos : pos + n]
        pos += n
        if orig:
            out += chunk
        elif comp == 1:
            try:
                out += zlib.decompress(chunk, -15)
            except zlib.error as e:
                raise ValueError(f"orc: DEFLATE error — quarantine ({e})") from e
        elif comp == 2:
            from shared_etl_pipelines_spark.sources.snappy import (
                snappy_decompress,
            )

            out += snappy_decompress(chunk)
        elif comp == 4:
            from shared_etl_pipelines_spark.sources.lz4 import (
                lz4_block_decompress,
            )

            out += lz4_block_decompress(chunk)
        else:  # comp == 5: ZSTD frames inside the chunk framing
            from shared_etl_pipelines_spark.sources.zstd_decode import (
                zstd_decompress,
            )

            out += zstd_decompress(chunk)
    return bytes(out)


def parse_orc_layout(blob: bytes) -> dict:
    """Tail walk -> layout dict. Refuses loudly on every structural
    lie: wrong magic (head or PostScript), stripe extents outside the
    content region, stripe row sum != numberOfRows, truncation."""
    if len(blob) < 4 or blob[:3] != b"ORC":
        raise ValueError("orc: bad header magic — quarantine")
    ps_len = blob[-1]
    if ps_len == 0 or len(blob) < 1 + ps_len + 3:
        raise ValueError("orc: truncated postscript — quarantine")
    ps = blob[len(blob) - 1 - ps_len : len(blob) - 1]
    footer_len = comp = meta_len = 0
    block = writer = 0
    magic = b""
    versions: list[int] = []
    for fno, _wt, v in _fields(ps):
        if fno == 1:
            footer_len = v
        elif fno == 2:
            comp = v
        elif fno == 3:
            block = v
        elif fno == 4:
            if isinstance(v, bytes):  # packed repeated varints
                q = 0
                while q < len(v):
                    u = shift = 0
                    while True:
                        b = v[q]
                        u |= (b & 0x7F) << shift
                        q += 1
                        if not b & 0x80:
                            break
                        shift += 7
                    versions.append(u)
            else:
                versions.append(v)
        elif fno == 5:
            meta_len = v
        elif fno == 6:
            writer = v
        elif fno == 8000:
            magic = v
    if magic != b"ORC":
        raise ValueError("orc: postscript magic mismatch — quarantine")
    codec = COMPRESSION.get(comp)
    if codec is None:
        raise ValueError(f"orc: reserved compression kind {comp} — quarantine")
    tail_end = len(blob) - 1 - ps_len
    if footer_len + meta_len > tail_end:
        raise ValueError("orc: footer extends past file start — quarantine")
    footer = _decompress_tail(
        blob[tail_end - footer_len : tail_end], comp, codec
    )

    stripes: list[dict] = []
    kinds: list[str] = []
    field_names: list[str] = []
    n_rows = content_len = 0
    stats: list[dict] = []
    for fno, _wt, v in _fields(footer):
        if fno == 2:
            content_len = v
        elif fno == 3:
            s = dict.fromkeys(("offset", "index", "data", "foot", "rows"), 0)
            for sf, _swt, sv in _fields(v):
                key = {1: "offset", 2: "index", 3: "data", 4: "foot", 5: "rows"}.get(sf)
                if key:
                    s[key] = sv
            stripes.append(s)
        elif fno == 4:
            kind = None
            for tf, _twt, tv in _fields(v):
                if tf == 1:
                    kind = TYPE_KINDS.get(tv)
                    if kind is None:
                        raise ValueError(f"orc: reserved type kind {tv}")
                elif tf == 3:
                    field_names.append(tv.decode())
            kinds.append(kind if kind is not None else "boolean")
        elif fno == 6:
            n_rows = v
        elif fno == 7:
            st = {"n_values": 0, "int_min": None, "int_max": None}
            for cf, _cwt, cv in _fields(v):
                if cf == 1:
                    st["n_values"] = cv
                elif cf == 2:
                    for inf, _iwt, iv in _fields(cv):
                        if inf == 1:
                            st["int_min"] = _unzigzag(iv)
                        elif inf == 2:
                            st["int_max"] = _unzigzag(iv)
            stats.append(st)

    if content_len + 3 > tail_end - footer_len - meta_len:
        raise ValueError("orc: content region truncated — quarantine")
    total = sum(s["rows"] for s in stripes)
    if total != n_rows:
        raise ValueError(
            f"orc: stripe rows {total} != numberOfRows {n_rows} — quarantine"
        )
    for s in stripes:
        if (
            s["offset"] < 3
            or s["offset"] + s["index"] + s["data"] + s["foot"]
            > content_len + 3
        ):
            raise ValueError("orc: stripe extent outside content — quarantine")
    return {
        "compression": codec,
        "compression_block": block,
        "writer_version": writer,
        "format_versions": versions,
        "n_stripes": len(stripes),
        "n_rows": n_rows,
        "stripes": stripes,
        "column_kinds": kinds,
        "field_names": field_names,
        "stats": stats,
    }
