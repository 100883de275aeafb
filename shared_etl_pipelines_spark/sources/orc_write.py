"""ORC WRITER with real data streams — the symmetric half of
sources/orc_data.py, sharing sources/orc.py's protobuf encode helpers
and codec chunk framing. Files written here must read back
value-identically through pyarrow's bundled reference ORC C++ reader
(and through the repo's own orc_data reader) — the inverse
cross-implementation gate.

Scope: flat columns of long / double / utf8 / boolean with nulls
(PRESENT streams over byte-RLE), integer RLEv2 DIRECT runs (closed
width table, MSB-first packing, zigzag), DIRECT_V2 strings, NONE /
ZLIB / SNAPPY / ZSTD compression (zstd via the repo's own store-mode
frame writer, r12), row-index-free stripes (rowIndexStride 0).
"""

from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.orc import (
    COMPRESSION,
    _codec_chunks,
    _kd,
    _kv,
    _type,
    _zlib_chunks,
)
from shared_etl_pipelines_spark.sources.orc_data import _WIDTHS

__all__ = ["write_orc_data"]


def _compress(body: bytes, compression: str, zstd_matches: bool = False) -> bytes:
    if compression == "NONE":
        return body
    if compression == "ZLIB":
        return _zlib_chunks(body)
    if compression in ("SNAPPY", "LZ4", "ZSTD"):
        return _codec_chunks(body, compression, zstd_matches=zstd_matches)
    raise ValueError(f"orc writer: codec {compression} unsupported")


def _uleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _MsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur << (8 - self.nbits))
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


def _rlev2_direct(values: list[int], signed: bool) -> bytes:
    """DIRECT runs of up to 512 values at the smallest closed width
    that fits the run."""
    out = bytearray()
    for start in range(0, len(values), 512):
        run = values[start : start + 512]
        enc = [((v << 1) ^ (v >> 63)) if signed else v for v in run]
        need = max((v.bit_length() for v in enc), default=1) or 1
        wcode = next(i for i, w in enumerate(_WIDTHS) if w >= need)
        width = _WIDTHS[wcode]
        ln = len(run) - 1
        out.append(0x40 | (wcode << 1) | (ln >> 8))
        out.append(ln & 0xFF)
        bw = _MsbWriter()
        for v in enc:
            bw.write(v, width)
        out += bw.done()
    return bytes(out)


def _byte_rle_literals(data: bytes) -> bytes:
    """Byte-RLE using literal groups only (always valid, never clever)."""
    out = bytearray()
    for start in range(0, len(data), 128):
        chunk = data[start : start + 128]
        out.append(256 - len(chunk))
        out += chunk
    return bytes(out)


def _bool_to_bytes(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 1 << (7 - (i & 7))
    return bytes(out)


def write_orc_data(
    columns: list[tuple[str, str, list]],
    compression: str = "ZLIB",
    zstd_matches: bool = False,
) -> bytes:
    """``columns``: (name, kind in long/double/utf8/boolean, values
    with None for nulls); one stripe. Returns complete file bytes.
    ``zstd_matches=True`` (r13) opts ZSTD chunks into the own
    encoder's predefined-FSE compressed blocks."""
    n_rows = len(columns[0][2]) if columns else 0
    for _n, _k, vals in columns:
        if len(vals) != n_rows:
            raise ValueError("orc writer: ragged columns")

    out = bytearray(b"ORC")
    stripe_start = len(out)
    streams_meta: list[tuple[int, int, int]] = []  # (kind, column, length)

    def emit(kind: int, col: int, body: bytes) -> None:
        comp = _compress(body, compression, zstd_matches)
        streams_meta.append((kind, col, len(comp)))
        out.extend(comp)

    for idx, (name, kind, vals) in enumerate(columns):
        col = idx + 1  # column 0 is the struct root
        present = [v is not None for v in vals]
        has_nulls = not all(present)
        if has_nulls:
            emit(0, col, _byte_rle_literals(_bool_to_bytes(present)))
        data = [v for v in vals if v is not None]
        if kind == "long":
            emit(1, col, _rlev2_direct(data, signed=True))
        elif kind == "double":
            emit(1, col, struct.pack(f"<{len(data)}d", *data))
        elif kind == "boolean":
            emit(1, col, _byte_rle_literals(_bool_to_bytes(data)))
        elif kind == "utf8":
            blobs = [v.encode("utf-8") for v in data]
            emit(1, col, b"".join(blobs))
            emit(2, col, _rlev2_direct([len(b) for b in blobs], signed=False))
        else:
            raise ValueError(f"orc writer: kind {kind!r} unsupported")

    data_len = len(out) - stripe_start
    # stripe footer: streams + column encodings (root + DIRECT_V2 leaves)
    sf = b"".join(
        _kd(1, _kv(1, k) + _kv(2, c) + _kv(3, ln))
        for k, c, ln in streams_meta
    )
    sf += _kd(2, _kv(1, 0))  # root struct: DIRECT
    for _name, kind, _vals in columns:
        enc = 2 if kind in ("long", "utf8") else 0  # DIRECT_V2 vs DIRECT
        sf += _kd(2, _kv(1, enc))
    sf_comp = _compress(sf, compression, zstd_matches)
    out += sf_comp

    stripe_info = _kd(
        3,
        _kv(1, stripe_start) + _kv(2, 0) + _kv(3, data_len)
        + _kv(4, len(sf_comp)) + _kv(5, n_rows),
    )
    kinds_map = {"long": "long", "double": "double", "utf8": "string",
                 "boolean": "boolean"}
    types = _kd(
        4,
        _type(
            "struct",
            subtypes=list(range(1, len(columns) + 1)),
            names=[c[0] for c in columns],
        ),
    )
    for _name, kind, _vals in columns:
        types += _kd(4, _type(kinds_map[kind]))
    content_end = len(out)
    footer = (
        _kv(1, 3) + _kv(2, content_end - 3) + stripe_info + types
        + _kv(6, n_rows) + _kv(8, 0)  # rowIndexStride 0: no row index
    )
    footer_bytes = _compress(footer, compression, zstd_matches)
    out += footer_bytes
    comp_no = {v: k for k, v in COMPRESSION.items()}[compression]
    ps = (
        _kv(1, len(footer_bytes)) + _kv(2, comp_no) + _kv(3, 262144)
        + _kd(4, _uleb(0) + _uleb(12)) + _kv(5, 0) + _kv(6, 9)
        + _kd(8000, b"ORC")
    )
    out += ps
    out.append(len(ps))
    return bytes(out)
