"""Arrow IPC reader from raw bytes — the PUBLIC Arrow columnar spec
(arrow.apache.org/docs/format/Columnar.html: the encapsulated message
protocol, File/Stream framing, and Message.fbs/Schema.fbs/File.fbs),
including a minimal FLATBUFFERS table walk implemented from the public
flatbuffers binary spec (vtables, soffsets, unions, struct vectors).

Completes the independent columnar-reader trilogy next to
sources/parquet_pages.py and sources/orc_data.py: schema, record
batches, validity bitmaps, and value buffers all decode with zero
pyarrow involvement, so pyarrow-written IPC files (both the file
format with its flatbuffer Footer and the bare stream format) are a
true cross-implementation check.

Scope: flat columns of Int(8-64, signed/unsigned)/FloatingPoint
(single/double)/Bool/Utf8/Binary with nulls, little-endian. Compressed
bodies (BodyCompression, BUFFER method) decode through the repo's OWN
lz4-frame and zstd decompressors (r12) — each constituent buffer is an
int64 uncompressed-length prefix + compressed bytes, -1 marking a
stored buffer. Dictionary batches and nested types refuse loudly.
"""

from __future__ import annotations

import struct

__all__ = ["read_ipc", "ipc_schema"]

_MAGIC = b"ARROW1"
_CONT = 0xFFFFFFFF


# ----------------------------------------------------------------------
# flatbuffers primitives (public binary format)
# ----------------------------------------------------------------------
class _FB:
    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos  # table position
        soff = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soff
        (self.vt_size,) = struct.unpack_from("<H", buf, self.vt)

    def _field_off(self, idx: int) -> int:
        slot = 4 + idx * 2
        if slot + 2 > self.vt_size:
            return 0
        (off,) = struct.unpack_from("<H", self.buf, self.vt + slot)
        return off

    def scalar(self, idx: int, fmt: str, default=0):
        off = self._field_off(idx)
        if not off:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + off)[0]

    def _indirect(self, idx: int) -> int | None:
        off = self._field_off(idx)
        if not off:
            return None
        p = self.pos + off
        (rel,) = struct.unpack_from("<I", self.buf, p)
        return p + rel

    def table(self, idx: int) -> "_FB | None":
        p = self._indirect(idx)
        return _FB(self.buf, p) if p is not None else None

    def string(self, idx: int) -> str | None:
        p = self._indirect(idx)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def vector(self, idx: int) -> tuple[int, int]:
        """(element_count, first_element_pos); (0, -1) when absent."""
        p = self._indirect(idx)
        if p is None:
            return 0, -1
        (n,) = struct.unpack_from("<I", self.buf, p)
        return n, p + 4


def _vec_tables(fb: _FB, idx: int) -> list[_FB]:
    n, p = fb.vector(idx)
    out = []
    for i in range(n):
        (rel,) = struct.unpack_from("<I", fb.buf, p + 4 * i)
        out.append(_FB(fb.buf, p + 4 * i + rel))
    return out


# ----------------------------------------------------------------------
# schema / message decode (Message.fbs + Schema.fbs field ids)
# ----------------------------------------------------------------------
_TYPE_NAMES = {
    2: "int", 3: "float", 4: "binary", 5: "utf8", 6: "bool",
}


def _decode_field(f: _FB) -> dict:
    name = f.string(0)
    nullable = bool(f.scalar(1, "<B", 0))
    ttype = f.scalar(2, "<B", 0)
    tname = _TYPE_NAMES.get(ttype)
    if tname is None:
        raise ValueError(f"arrow: field type union {ttype} unsupported")
    t = f.table(3)
    info = {"name": name, "nullable": nullable, "type": tname}
    if tname == "int":
        info["bits"] = t.scalar(0, "<i", 0) if t else 0
        info["signed"] = bool(t.scalar(1, "<B", 0)) if t else False
    elif tname == "float":
        prec = t.scalar(0, "<h", 0) if t else 0
        if prec not in (1, 2):
            raise ValueError("arrow: half floats unsupported — quarantine")
        info["bits"] = 32 if prec == 1 else 64
    if f.table(4) is not None:
        raise ValueError("arrow: dictionary-encoded fields unsupported")
    n_children, _ = f.vector(5)
    if n_children:
        raise ValueError("arrow: nested fields unsupported — quarantine")
    return info


def _decode_schema(s: _FB) -> list[dict]:
    return [_decode_field(f) for f in _vec_tables(s, 1)]


def _messages(buf: bytes, p: int, end: int):
    """Yield (header_type, header_fb, body_bytes) per encapsulated
    message until the end-of-stream marker or ``end``."""
    while p + 8 <= end:
        (cont,) = struct.unpack_from("<I", buf, p)
        if cont != _CONT:
            raise ValueError("arrow: missing continuation marker — quarantine")
        (mlen,) = struct.unpack_from("<i", buf, p + 4)
        p += 8
        if mlen == 0:
            return  # end-of-stream
        msg = _FB(buf, p + struct.unpack_from("<I", buf, p)[0])
        htype = msg.scalar(1, "<B", 0)
        header = msg.table(2)
        body_len = msg.scalar(3, "<q", 0)
        body_start = p + mlen
        yield htype, header, buf[body_start : body_start + body_len]
        p = body_start + body_len


def _body_buffers(header: _FB, body: bytes) -> list[bytes]:
    """Materialize the batch's constituent buffers, decompressing each
    through the repo's own codecs when a BodyCompression is declared
    (BUFFER method: per-buffer int64 uncompressed-length prefix, -1 =
    stored)."""
    comp = header.table(3)
    codec = None
    if comp is not None:
        cid = comp.scalar(0, "<b", 0)
        if cid == 0:
            codec = "lz4"
        elif cid == 1:
            codec = "zstd"
        else:
            raise ValueError(f"arrow: compression codec {cid} unsupported")
        method = comp.scalar(1, "<b", 0)
        if method != 0:
            raise ValueError("arrow: only BUFFER-method compression")
    n_bufs, bpos = header.vector(2)
    out: list[bytes] = []
    for i in range(n_bufs):
        off, ln = struct.unpack_from("<2q", header.buf, bpos + 16 * i)
        raw = body[off : off + ln]
        if codec is None or not raw:
            out.append(raw)
            continue
        if len(raw) < 8:
            raise ValueError("arrow: compressed buffer lacks its prefix")
        (usize,) = struct.unpack_from("<q", raw, 0)
        if usize == -1:  # stored as-is
            out.append(raw[8:])
            continue
        if codec == "lz4":
            from shared_etl_pipelines_spark.sources.lz4 import (
                lz4_frame_decompress,
            )

            dec = lz4_frame_decompress(raw[8:])
        else:
            from shared_etl_pipelines_spark.sources.zstd_decode import (
                zstd_decompress,
            )

            dec = zstd_decompress(raw[8:])
        if len(dec) != usize:
            raise ValueError(
                "arrow: buffer prefix lies about its size — quarantine"
            )
        out.append(dec)
    return out


def _decode_batch(header: _FB, body: bytes, fields: list[dict]) -> dict:
    n_rows = header.scalar(0, "<q", 0)
    n_nodes, npos = header.vector(1)
    nodes = [
        struct.unpack_from("<2q", header.buf, npos + 16 * i)
        for i in range(n_nodes)
    ]
    bufs = _body_buffers(header, body)
    if n_nodes != len(fields):
        raise ValueError("arrow: node count != field count — quarantine")
    cols: dict[str, list] = {}
    bi = 0
    for f, (f_len, f_nulls) in zip(fields, nodes):
        validity = bufs[bi]
        bi += 1
        if f["type"] in ("utf8", "binary"):
            obuf = bufs[bi]
            data = bufs[bi + 1]
            bi += 2
            offs = struct.unpack_from(f"<{f_len + 1}i", obuf, 0)
            vals = [data[offs[i] : offs[i + 1]] for i in range(f_len)]
            if f["type"] == "utf8":
                vals = [v.decode("utf-8") for v in vals]
        elif f["type"] == "bool":
            data = bufs[bi]
            bi += 1
            vals = [
                bool(data[i >> 3] >> (i & 7) & 1) for i in range(f_len)
            ]
        elif f["type"] == "int":
            data = bufs[bi]
            bi += 1
            bits = f["bits"]
            code = {8: "b", 16: "h", 32: "i", 64: "q"}.get(bits)
            if code is None:
                raise ValueError(f"arrow: int{bits} unsupported")
            if not f["signed"]:
                code = code.upper()
            vals = list(struct.unpack_from(f"<{f_len}{code}", data, 0))
        else:  # float
            data = bufs[bi]
            bi += 1
            code = "f" if f["bits"] == 32 else "d"
            vals = list(struct.unpack_from(f"<{f_len}{code}", data, 0))
        if f_nulls and validity:
            vals = [
                vals[i]
                if validity[i >> 3] >> (i & 7) & 1
                else None
                for i in range(f_len)
            ]
        cols[f["name"]] = vals
    return {"n_rows": n_rows, "columns": cols}


def read_ipc(blob: bytes) -> dict:
    """Decode an Arrow IPC FILE or STREAM: returns
    {fields, n_batches, columns} with per-column value lists
    concatenated across batches."""
    if blob[:6] == _MAGIC:
        # file format: magic + pad, messages, footer, i32 footer len, magic
        if blob[-6:] != _MAGIC:
            raise ValueError("arrow: missing trailing magic — quarantine")
        start, end = 8, len(blob) - 10
    else:
        start, end = 0, len(blob)
    fields: list[dict] | None = None
    out_cols: dict[str, list] = {}
    n_batches = 0
    for htype, header, body in _messages(blob, start, end):
        if htype == 1:  # Schema
            fields = _decode_schema(header)
            out_cols = {f["name"]: [] for f in fields}
        elif htype == 3:  # RecordBatch
            if fields is None:
                raise ValueError("arrow: batch before schema — quarantine")
            batch = _decode_batch(header, body, fields)
            for k, v in batch["columns"].items():
                out_cols[k].extend(v)
            n_batches += 1
        elif htype == 2:
            raise ValueError("arrow: dictionary batches unsupported")
        else:
            raise ValueError(f"arrow: message type {htype} unsupported")
    if fields is None:
        raise ValueError("arrow: no schema message — quarantine")
    return {"fields": fields, "n_batches": n_batches, "columns": out_cols}


def ipc_schema(blob: bytes) -> list[dict]:
    return read_ipc(blob)["fields"]
