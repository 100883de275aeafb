"""ORC stripe DATA decode from raw bytes — the PUBLIC ORCv1 spec
(orc.apache.org/specification/ORCv1), layered on the repo's own ORC
tail walker (sources/orc.py: protobuf wire walk + codec chunk
framing).

The parquet twin of sources/parquet_pages.py: with it the engine reads
ORC columns with zero library involvement — stripe footers (streams +
column encodings), PRESENT bit streams over byte-RLE, integer RLEv2
(all four sub-encodings: SHORT_REPEAT, DIRECT, PATCHED_BASE, DELTA —
MSB-first bit packing, the 5-bit closed width table, sign-magnitude
patched bases), strings in DIRECT_V2 and DICTIONARY_V2 encodings, and
raw IEEE754 doubles. pyarrow bundles the reference ORC C++ writer, so
every test cross-checks this decoder against independently-written
files across compression kinds (NONE/ZLIB/SNAPPY/LZ4/ZSTD — all
decoded by the repo's own codecs).

Scope: flat columns of long/double/string/boolean. Nested types,
timestamps, and decimal refuse loudly.
"""

from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.orc import (
    COMPRESSION,
    _decompress_tail,
    _fields,
    parse_orc_layout,
)

__all__ = ["read_orc_column"]

# the spec's 5-bit closed width table (DIRECT/PATCHED_BASE widths;
# code 0 means 0 bits only inside DELTA)
_WIDTHS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _uleb(buf: bytes, p: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if p >= len(buf):
            raise ValueError("orc: truncated varint — quarantine")
        b = buf[p]
        v |= (b & 0x7F) << shift
        p += 1
        if not b & 0x80:
            return v, p
        shift += 7


class _MsbBits:
    """MSB-first forward bit reader (RLEv2 packs big-endian bits)."""

    def __init__(self, buf: bytes, p: int) -> None:
        self.buf = buf
        self.p = p
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.p >= len(self.buf):
                raise ValueError("orc: bit stream truncated — quarantine")
            v = (v << 1) | ((self.buf[self.p] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.p += 1
        return v

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.p += 1
        return self.p


def _rlev2(buf: bytes, signed: bool) -> list[int]:
    """Decode an entire RLEv2 stream."""
    out: list[int] = []
    p = 0
    while p < len(buf):
        h = buf[p]
        enc = h >> 6
        if enc == 0:  # SHORT_REPEAT
            width = ((h >> 3) & 0x7) + 1
            count = (h & 0x7) + 3
            if p + 1 + width > len(buf):
                raise ValueError("orc: short-repeat truncated")
            v = int.from_bytes(buf[p + 1 : p + 1 + width], "big")
            if signed:
                v = _unzigzag(v)
            out.extend([v] * count)
            p += 1 + width
        elif enc == 1:  # DIRECT
            width = _WIDTHS[(h >> 1) & 0x1F]
            length = (((h & 1) << 8) | buf[p + 1]) + 1
            bits = _MsbBits(buf, p + 2)
            vals = [bits.read(width) for _ in range(length)]
            p = bits.align()
            out.extend(_unzigzag(v) if signed else v for v in vals)
        elif enc == 3:  # DELTA
            wcode = (h >> 1) & 0x1F
            width = 0 if wcode == 0 else _WIDTHS[wcode]
            length = (((h & 1) << 8) | buf[p + 1]) + 1
            q = p + 2
            base_u, q = _uleb(buf, q)
            base = _unzigzag(base_u) if signed else base_u
            delta_u, q = _uleb(buf, q)
            delta_base = _unzigzag(delta_u)
            vals = [base]
            if length > 1:
                vals.append(base + delta_base)
            if width == 0:
                for _ in range(length - 2):
                    vals.append(vals[-1] + delta_base)
                p = q
            else:
                bits = _MsbBits(buf, q)
                sign = 1 if delta_base >= 0 else -1
                for _ in range(length - 2):
                    d = bits.read(width)
                    vals.append(vals[-1] + sign * d)
                p = bits.align()
            out.extend(vals)
        else:  # PATCHED_BASE
            width = _WIDTHS[(h >> 1) & 0x1F]
            length = (((h & 1) << 8) | buf[p + 1]) + 1
            b3, b4 = buf[p + 2], buf[p + 3]
            bw = ((b3 >> 5) & 0x7) + 1
            pw = _WIDTHS[b3 & 0x1F]
            pgw = ((b4 >> 5) & 0x7) + 1
            pll = b4 & 0x1F
            q = p + 4
            raw_base = int.from_bytes(buf[q : q + bw], "big")
            sign_bit = 1 << (bw * 8 - 1)
            base = (
                -(raw_base & (sign_bit - 1)) if raw_base & sign_bit else raw_base
            )
            q += bw
            bits = _MsbBits(buf, q)
            vals = [bits.read(width) for _ in range(length)]
            q = bits.align()
            pbits = _MsbBits(buf, q)
            pw_total = pgw + pw
            # patch entries are packed then padded to a byte multiple
            idx = 0
            for _ in range(pll):
                entry = pbits.read(pw_total)
                gap = entry >> pw
                patch = entry & ((1 << pw) - 1)
                idx += gap
                if idx >= length:
                    raise ValueError("orc: patch gap overruns run")
                vals[idx] |= patch << width
            p = pbits.align()
            out.extend(base + v for v in vals)
    return out


def _byte_rle(buf: bytes) -> bytes:
    out = bytearray()
    p = 0
    while p < len(buf):
        h = buf[p]
        p += 1
        if h < 128:  # run
            if p >= len(buf):
                raise ValueError("orc: byte-RLE run truncated")
            out.extend([buf[p]] * (h + 3))
            p += 1
        else:  # literals
            n = 256 - h
            if p + n > len(buf):
                raise ValueError("orc: byte-RLE literals truncated")
            out.extend(buf[p : p + n])
            p += n
    return bytes(out)


def _bool_stream(buf: bytes, n: int) -> list[bool]:
    data = _byte_rle(buf)
    if len(data) * 8 < n:
        raise ValueError("orc: boolean stream too short — quarantine")
    return [bool(data[i >> 3] >> (7 - (i & 7)) & 1) for i in range(n)]


def _stripe_footer(blob: bytes, layout: dict, stripe: dict) -> tuple[list, list]:
    comp_no = {v: k for k, v in COMPRESSION.items()}[layout["compression"]]
    start = stripe["offset"] + stripe["index"] + stripe["data"]
    raw = _decompress_tail(
        blob[start : start + stripe["foot"]], comp_no, layout["compression"]
    )
    streams = []
    encodings = []
    for fno, _wt, v in _fields(raw):
        if fno == 1:
            s = {"kind": 0, "column": 0, "length": 0}
            for sf, _swt, sv in _fields(v):
                if sf == 1:
                    s["kind"] = sv
                elif sf == 2:
                    s["column"] = sv
                elif sf == 3:
                    s["length"] = sv
            streams.append(s)
        elif fno == 2:
            e = {"kind": 0, "dict_size": 0}
            for ef, _ewt, ev in _fields(v):
                if ef == 1:
                    e["kind"] = ev
                elif ef == 2:
                    e["dict_size"] = ev
            encodings.append(e)
    return streams, encodings


def read_orc_column(blob: bytes, col_name: str) -> list:
    """All values of one flat column across every stripe (None=null)."""
    layout = parse_orc_layout(blob)
    names = layout["field_names"]
    if col_name not in names:
        raise ValueError(f"orc: no column {col_name!r} — quarantine")
    col_id = names.index(col_name) + 1  # column 0 is the struct root
    kind = layout["column_kinds"][col_id]
    if kind not in ("long", "int", "double", "string", "boolean"):
        raise ValueError(f"orc: column kind {kind!r} unsupported — quarantine")
    comp_no = {v: k for k, v in COMPRESSION.items()}[layout["compression"]]
    out: list = []
    for stripe in layout["stripes"]:
        streams, encodings = _stripe_footer(blob, layout, stripe)
        enc = encodings[col_id]["kind"]
        # locate this column's streams within the data region (streams
        # are laid out in listed order; index streams come first)
        pos = stripe["offset"]
        chunks: dict[int, bytes] = {}
        for s in streams:
            if s["kind"] in (6, 7, 8, 9):  # index/bloom streams region
                pos += s["length"]
                continue
            if s["column"] == col_id:
                chunks[s["kind"]] = _decompress_tail(
                    blob[pos : pos + s["length"]], comp_no,
                    layout["compression"],
                )
            pos += s["length"]
        n_rows = stripe["rows"]
        present = (
            _bool_stream(chunks[0], n_rows) if 0 in chunks else [True] * n_rows
        )
        n_present = sum(present)
        if kind in ("long", "int"):
            if enc not in (2,):  # DIRECT_V2
                raise ValueError(f"orc: int encoding {enc} unsupported")
            vals = _rlev2(chunks.get(1, b""), signed=True)
        elif kind == "double":
            raw = chunks.get(1, b"")
            vals = list(struct.unpack(f"<{len(raw) // 8}d", raw))
        elif kind == "boolean":
            vals = _bool_stream(chunks.get(1, b""), n_present)
        else:  # string
            if enc == 2:  # DIRECT_V2
                lengths = _rlev2(chunks.get(2, b""), signed=False)
                data = chunks.get(1, b"")
                vals = []
                q = 0
                for ln in lengths:
                    vals.append(data[q : q + ln].decode("utf-8"))
                    q += ln
            elif enc == 3:  # DICTIONARY_V2
                lengths = _rlev2(chunks.get(2, b""), signed=False)
                dict_data = chunks.get(3, b"")
                dictionary = []
                q = 0
                for ln in lengths:
                    dictionary.append(dict_data[q : q + ln].decode("utf-8"))
                    q += ln
                idx = _rlev2(chunks.get(1, b""), signed=False)
                try:
                    vals = [dictionary[i] for i in idx]
                except IndexError:
                    raise ValueError("orc: dictionary index out of range") from None
            else:
                raise ValueError(f"orc: string encoding {enc} unsupported")
        if len(vals) < n_present:
            raise ValueError("orc: value stream shorter than present bits")
        it = iter(vals)
        out.extend(next(it) if pr else None for pr in present)
    return out
