"""Arrow IPC STREAM writer from raw bytes — the write-side symmetry of
sources/arrow_ipc.py, including a minimal FLATBUFFERS BUILDER
implemented from the public binary spec (back-to-front construction,
vtables, end-anchored alignment, forward uoffsets).

Files written here must read back value-identically through pyarrow's
reference IPC reader (and the repo's own reader) — completing the
read/write independence table for all three columnar formats
(parquet: parquet_pages/parquet_write; ORC: orc_data/orc_write;
Arrow: arrow_ipc/this module).

Scope: the stream framing (schema message, record-batch messages,
end-of-stream marker), flat columns of int64 / double / utf8 / bool
with validity bitmaps, 8-byte aligned bodies per spec — and (r12)
BodyCompression emission: each non-empty buffer becomes an int64
uncompressed-length prefix + a frame from the repo's OWN lz4 or zstd
compressor, which pyarrow's reference reader then decodes.
"""

from __future__ import annotations

import struct

__all__ = ["write_ipc_stream"]


class _FbBuilder:
    """Back-to-front flatbuffers builder. Offsets are measured from the
    buffer END (the alignment anchor, per the format)."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def offset(self) -> int:
        return len(self.buf)

    def _prepend(self, data: bytes) -> None:
        self.buf[:0] = data

    def pad(self, n: int) -> None:
        if n:
            self._prepend(b"\x00" * n)

    def align(self, size: int, extra: int = 0) -> None:
        """Pad so that after writing ``extra`` more bytes the front of
        the buffer sits at a multiple of ``size`` from the end."""
        self.pad((-(len(self.buf) + extra)) % size)

    def scalar(self, fmt: str, v) -> int:
        data = struct.pack("<" + fmt, v)
        self.align(len(data), len(data))
        self._prepend(data)
        return self.offset()

    def uoffset(self, target: int) -> None:
        """Prepend a forward u32 offset pointing at ``target``."""
        self.align(4, 4)
        here = self.offset() + 4
        self._prepend(struct.pack("<I", here - target))

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        # pad FIRST so [len][data][nul] stays contiguous with the
        # length word 4-aligned from the end
        self.pad((-(len(self.buf) + 1 + len(data) + 4)) % 4)
        self._prepend(b"\x00")
        self._prepend(data)
        self._prepend(struct.pack("<I", len(data)))
        return self.offset()

    def vector_of_offsets(self, targets: list[int]) -> int:
        # elements prepended in reverse so they appear in order
        self.align(4, 4 * (len(targets) + 1))
        for t in reversed(targets):
            here = self.offset() + 4
            self._prepend(struct.pack("<I", here - t))
        self._prepend(struct.pack("<I", len(targets)))
        return self.offset()

    def vector_of_structs(self, elem_size: int, blobs: list[bytes]) -> int:
        body = b"".join(blobs)
        # align the FIRST STRUCT (not the count) to 8 from the end
        self.pad((-(len(self.buf) + len(body))) % 8)
        self._prepend(body)
        self._prepend(struct.pack("<I", len(blobs)))
        return self.offset()

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """``fields``: (slot, kind, value) with kind in
        {'i16','i32','i64','u8','bool','offset'}; offsets reference
        already-built children. Returns the table's offset."""
        slots: dict[int, int] = {}
        sizes: dict[int, int] = {}
        scalars = {"i16": ("h", 2), "i32": ("i", 4), "i64": ("q", 8),
                   "u8": ("B", 1), "bool": ("B", 1)}
        # write fields back-to-front so earlier slots sit closer to the
        # table start (not required by the format, but keeps layout sane)
        for slot, kind, val in sorted(fields, key=lambda f: -f[0]):
            if kind == "offset":
                self.uoffset(int(val))
                sizes[slot] = 4
            else:
                fmt, size = scalars[kind]
                self.align(size, size)
                self._prepend(struct.pack("<" + fmt, val))
                sizes[slot] = size
            slots[slot] = self.offset()
        self.align(4, 4)
        self._prepend(b"\x00" * 4)  # soffset placeholder
        table_off = self.offset()
        n_slots = (max(slots) + 1) if slots else 0
        # declared table size must cover every inline field (verifiers
        # check field_offset + field_size <= table_size)
        tbl_size = 4
        for i in slots:
            tbl_size = max(tbl_size, (table_off - slots[i]) + sizes[i])
        vt = bytearray()
        vt += struct.pack("<H", 4 + 2 * n_slots)
        vt += struct.pack("<H", tbl_size)
        for i in range(n_slots):
            vt += struct.pack(
                "<H", (table_off - slots[i]) if i in slots else 0
            )
        self.align(2, len(vt))
        self._prepend(bytes(vt))
        vtable_off = self.offset()
        # patch the soffset: vtable_pos = table_pos - soffset
        pos = len(self.buf) - table_off
        struct.pack_into("<i", self.buf, pos, vtable_off - table_off)
        return table_off

    def finish(self, root: int) -> bytes:
        # verifiers check scalar alignment from the buffer START; the
        # builder anchors at the END, so the two agree only when the
        # total length is a multiple of the max alignment (8)
        self.pad((-(len(self.buf) + 4)) % 8)
        here = self.offset() + 4
        self._prepend(struct.pack("<I", here - root))
        return bytes(self.buf)


def _encapsulate(fb: bytes, body: bytes = b"") -> bytes:
    pad = (-len(fb)) % 8
    meta = fb + b"\x00" * pad
    return (
        struct.pack("<Ii", 0xFFFFFFFF, len(meta)) + meta + body
    )


def _schema_message(fields: list[tuple[str, str]]) -> bytes:
    b = _FbBuilder()
    field_offs = []
    for name, kind in fields:
        if kind == "int64":
            t = b.table([(0, "i32", 64), (1, "bool", 1)])
            ttype = 2
        elif kind == "double":
            t = b.table([(0, "i16", 2)])  # Precision DOUBLE
            ttype = 3
        elif kind == "utf8":
            t = b.table([])
            ttype = 5
        elif kind == "bool":
            t = b.table([])
            ttype = 6
        else:
            raise ValueError(f"arrow writer: kind {kind!r} unsupported")
        name_off = b.string(name)
        field_offs.append(
            b.table(
                [
                    (0, "offset", name_off),
                    (1, "bool", 1),  # nullable
                    (2, "u8", ttype),
                    (3, "offset", t),
                ]
            )
        )
    fvec = b.vector_of_offsets(field_offs)
    schema = b.table([(1, "offset", fvec)])
    msg = b.table(
        [
            (0, "i16", 4),  # MetadataVersion V5
            (1, "u8", 1),  # header type: Schema
            (2, "offset", schema),
            (3, "i64", 0),
        ]
    )
    return _encapsulate(b.finish(msg))


def _pad8(data: bytes) -> bytes:
    return data + b"\x00" * ((-len(data)) % 8)


def _validity(vals: list) -> tuple[bytes, int]:
    nulls = sum(1 for v in vals if v is None)
    if nulls == 0:
        return b"", 0
    bits = bytearray((len(vals) + 7) // 8)
    for i, v in enumerate(vals):
        if v is not None:
            bits[i >> 3] |= 1 << (i & 7)
    return bytes(bits), nulls


def _batch_message(
    columns: list[tuple[str, str, list]], compression: str | None = None
) -> bytes:
    n_rows = len(columns[0][2]) if columns else 0
    body = bytearray()
    nodes: list[bytes] = []
    buffers: list[bytes] = []

    def add_buffer(data: bytes) -> None:
        if compression and data:
            if compression == "zstd":
                from shared_etl_pipelines_spark.sources.zstd_encode import (
                    zstd_compress,
                )

                comp = zstd_compress(data)
            else:
                from shared_etl_pipelines_spark.sources.lz4 import (
                    lz4_frame_compress,
                )

                comp = lz4_frame_compress(data)
            data = struct.pack("<q", len(data)) + comp
        buffers.append(struct.pack("<2q", len(body), len(data)))
        body.extend(_pad8(data))

    for _name, kind, vals in columns:
        validity, nulls = _validity(vals)
        nodes.append(struct.pack("<2q", len(vals), nulls))
        add_buffer(validity)
        if kind == "utf8":
            offs = [0]
            data = bytearray()
            for v in vals:
                if v is not None:
                    data.extend(v.encode("utf-8"))
                offs.append(len(data))
            add_buffer(struct.pack(f"<{len(offs)}i", *offs))
            add_buffer(bytes(data))
        elif kind == "bool":
            bits = bytearray((len(vals) + 7) // 8)
            for i, v in enumerate(vals):
                if v:
                    bits[i >> 3] |= 1 << (i & 7)
            add_buffer(bytes(bits))
        elif kind == "int64":
            add_buffer(
                struct.pack(
                    f"<{len(vals)}q", *[0 if v is None else v for v in vals]
                )
            )
        else:  # double
            add_buffer(
                struct.pack(
                    f"<{len(vals)}d",
                    *[0.0 if v is None else v for v in vals],
                )
            )

    b = _FbBuilder()
    nvec = b.vector_of_structs(16, nodes)
    bvec = b.vector_of_structs(16, buffers)
    rb_fields = [(0, "i64", n_rows), (1, "offset", nvec), (2, "offset", bvec)]
    if compression:
        # BodyCompression table: codec i8 (0=LZ4_FRAME default, 1=ZSTD),
        # method BUFFER (0, default, omitted)
        bc = b.table(
            [(0, "u8", 1)] if compression == "zstd" else []
        )
        rb_fields.append((3, "offset", bc))
    rb = b.table(rb_fields)
    msg = b.table(
        [
            (0, "i16", 4),
            (1, "u8", 3),  # header type: RecordBatch
            (2, "offset", rb),
            (3, "i64", len(body)),
        ]
    )
    return _encapsulate(b.finish(msg), bytes(body))


def write_ipc_stream(
    columns: list[tuple[str, str, list]],
    batch_size: int = 1 << 20,
    compression: str | None = None,
) -> bytes:
    """``columns``: (name, kind in int64/double/utf8/bool, values with
    None for nulls). Returns Arrow IPC STREAM bytes.
    ``compression``: None, 'lz4' or 'zstd' — buffers then carry the
    spec's uncompressed-length prefix + a frame from the repo's own
    compressor."""
    if compression not in (None, "lz4", "zstd"):
        raise ValueError(f"arrow writer: compression {compression!r}")
    n_rows = len(columns[0][2]) if columns else 0
    for _n, _k, vals in columns:
        if len(vals) != n_rows:
            raise ValueError("arrow writer: ragged columns")
    out = bytearray(_schema_message([(n, k) for n, k, _v in columns]))
    for start in range(0, max(n_rows, 1), batch_size):
        if start >= n_rows and n_rows:
            break
        chunk = [
            (n, k, v[start : start + batch_size]) for n, k, v in columns
        ]
        out += _batch_message(chunk, compression)
        if n_rows == 0:
            break
    out += struct.pack("<Ii", 0xFFFFFFFF, 0)  # end-of-stream
    return bytes(out)
