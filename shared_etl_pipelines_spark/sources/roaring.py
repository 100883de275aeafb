"""Portable RoaringBitmap (de)serialization — the PUBLIC interchange
format (github.com/RoaringBitmap/RoaringFormatSpec), implemented from
the spec because Delta Lake deletion vectors ship their deleted-row
sets as roaring bitmaps (sources/deletion_vectors.py) and nothing in
this container provides a decoder.

Scope: the 32-bit portable format — both cookies (12346 "no run
containers" with the offset header, 12347 with the run-flag bitset),
and all three container kinds (array / bitmap / run) on decode. The
encoder emits the canonical container choice (array when cardinality
<= 4096 else bitmap, cookie 12346) — enough to round-trip any value
set; run containers are decode-only because this writer never needs
the run optimization for fixtures.

Everything is driver/executor-agnostic pure Python over ``bytes`` —
the executor-side DV decode calls it inside mapInPandas.
"""

from __future__ import annotations

import struct

__all__ = ["serialize_roaring", "deserialize_roaring"]

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # spec: offsets omitted only for small run-cookie maps


def serialize_roaring(values: list[int] | set[int]) -> bytes:
    """Canonical portable serialization of a set of uint32 values."""
    vals = sorted(set(values))
    if vals and not 0 <= vals[0] <= vals[-1] <= 0xFFFFFFFF:
        raise ValueError("roaring: values must be uint32")
    # split into containers by high 16 bits
    containers: dict[int, list[int]] = {}
    for v in vals:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = [struct.pack("<II", _COOKIE_NO_RUN, len(keys))]
    for k in keys:
        out.append(struct.pack("<HH", k, len(containers[k]) - 1))
    # offset header (mandatory for the no-run cookie)
    pos = 8 + 4 * len(keys) + 4 * len(keys)
    offsets = []
    bodies = []
    for k in keys:
        vs = containers[k]
        if len(vs) <= 4096:
            body = struct.pack(f"<{len(vs)}H", *vs)
        else:
            bits = bytearray(8192)
            for v in vs:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
        offsets.append(pos)
        bodies.append(body)
        pos += len(body)
    out.extend(struct.pack("<I", o) for o in offsets)
    out.extend(bodies)
    return b"".join(out)


def deserialize_roaring(blob: bytes) -> list[int]:
    """Decode a portable 32-bit roaring bitmap to sorted values. Refuses
    malformed input with ValueError (the DV layer quarantines)."""
    if len(blob) < 8:
        raise ValueError("roaring: truncated header")
    cookie16 = struct.unpack_from("<H", blob, 0)[0]
    if cookie16 == _COOKIE_RUN:
        n = (struct.unpack_from("<H", blob, 2)[0]) + 1
        run_flags = blob[4 : 4 + (n + 7) // 8]
        p = 4 + (n + 7) // 8
        has_run = True
    else:
        cookie, n = struct.unpack_from("<II", blob, 0)
        if cookie != _COOKIE_NO_RUN:
            raise ValueError(f"roaring: bad cookie {cookie}")
        run_flags = b""
        p = 8
        has_run = False
    keys_cards = []
    for _ in range(n):
        if p + 4 > len(blob):
            raise ValueError("roaring: truncated descriptive header")
        k, c1 = struct.unpack_from("<HH", blob, p)
        keys_cards.append((k, c1 + 1))
        p += 4
    if not has_run or n >= _NO_OFFSET_THRESHOLD:
        p += 4 * n  # skip the offset header; containers are sequential
    out: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        is_run = has_run and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            if p + 2 > len(blob):
                raise ValueError("roaring: truncated run container")
            n_runs = struct.unpack_from("<H", blob, p)[0]
            p += 2
            for _ in range(n_runs):
                start, length1 = struct.unpack_from("<HH", blob, p)
                p += 4
                out.extend(base + v for v in range(start, start + length1 + 1))
        elif card <= 4096:
            if p + 2 * card > len(blob):
                raise ValueError("roaring: truncated array container")
            vs = struct.unpack_from(f"<{card}H", blob, p)
            p += 2 * card
            out.extend(base + v for v in vs)
        else:
            if p + 8192 > len(blob):
                raise ValueError("roaring: truncated bitmap container")
            chunk = blob[p : p + 8192]
            p += 8192
            got = [base + (byte_i << 3) + bit
                   for byte_i, b in enumerate(chunk) if b
                   for bit in range(8) if b & (1 << bit)]
            if len(got) != card:
                raise ValueError("roaring: bitmap cardinality mismatch")
            out.extend(got)
    return out


# ----------------------------------------------------------------------
# bitmap index over a key column: the corpus-slicing structure a 100 TB
# curation pipeline keeps per tag/license/language — predicates
# evaluate as bitmap AND/OR/ANDNOT without ever shuffling documents.
# ----------------------------------------------------------------------


def build_bitmap_index(df, key_col: str, id_col: str):
    """Per-key serialized roaring bitmaps of the uint32 ids carrying
    that key. Scale shape: per-partition partial bitmaps (mapInPandas,
    one pass), then an OR-merge per key in a hash aggregate — the
    bitmap union is associative, so the merge is a normal combiner
    tree; document rows never shuffle, only the (tiny) bitmaps do.
    Returns a DataFrame (key, bitmap binary, cardinality long)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict[str, set] = {}
            for k, i in zip(pdf[key_col], pdf[id_col]):
                acc.setdefault(str(k), set()).add(int(i))
            yield pd.DataFrame(
                {
                    "key": list(acc),
                    "bitmap": [serialize_roaring(v) for v in acc.values()],
                }
            )

    def merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict[str, set] = {}
            for k, b in zip(pdf["key"], pdf["bitmap"]):
                acc.setdefault(k, set()).update(deserialize_roaring(bytes(b)))
            yield pd.DataFrame(
                {
                    "key": list(acc),
                    "bitmap": [serialize_roaring(v) for v in acc.values()],
                    "cardinality": [len(v) for v in acc.values()],
                }
            )

    part = df.select(
        F.col(key_col).alias(key_col), F.col(id_col).alias(id_col)
    ).mapInPandas(partials, "key string, bitmap binary")
    return (
        part.repartition("key")
        .mapInPandas(merge, "key string, bitmap binary, cardinality long")
    )


def bitmap_slice(index_rows: list[tuple[str, bytes]], expr: list) -> list[int]:
    """Evaluate a slice predicate against collected index rows (the
    index is metadata-scale: one row per tag). ``expr`` is a prefix
    list: ["and"|"or"|"andnot", a, b] with leaves as key strings."""
    bitmaps = {k: set(deserialize_roaring(bytes(b))) for k, b in index_rows}

    def ev(e):
        if isinstance(e, str):
            if e not in bitmaps:
                raise ValueError(f"bitmap index: unknown key {e!r}")
            return bitmaps[e]
        op, a, b = e
        va, vb = ev(a), ev(b)
        if op == "and":
            return va & vb
        if op == "or":
            return va | vb
        if op == "andnot":
            return va - vb
        raise ValueError(f"bitmap index: unknown op {op!r}")

    return sorted(ev(expr))
