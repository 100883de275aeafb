"""Portable RoaringBitmap (de)serialization — the PUBLIC interchange
format (github.com/RoaringBitmap/RoaringFormatSpec), implemented from
the spec because Delta Lake deletion vectors ship their deleted-row
sets as roaring bitmaps (sources/deletion_vectors.py) and nothing in
this container provides a decoder.

Scope: the 32-bit portable format — both cookies (12346 "no run
containers" with the offset header, 12347 with the run-flag bitset),
all three container kinds (array / bitmap / run) on BOTH encode and
decode (the encoder picks the canonical smallest encoding per
container, so takedown-style dense ranges serialize as runs at
~10 bytes instead of 8 KiB bitmaps), plus the 64-bit bucketed
extension from the same spec repo (uint64 bucket count, then
high-32-bit key + nested 32-bit bitmap per bucket) so document ids in
a >4-billion-row corpus still index.

Everything is driver/executor-agnostic pure Python over ``bytes`` —
the executor-side DV decode calls it inside mapInPandas.
"""

from __future__ import annotations

import struct

__all__ = [
    "serialize_roaring",
    "deserialize_roaring",
    "serialize_roaring64",
    "deserialize_roaring64",
]

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # spec: offsets omitted only for small run-cookie maps


def _runs_of(vs: list[int]) -> list[tuple[int, int]]:
    """Maximal runs of consecutive values, as (start, length-1) pairs."""
    runs: list[tuple[int, int]] = []
    start = prev = vs[0]
    for v in vs[1:]:
        if v != prev + 1:
            runs.append((start, prev - start))
            start = v
        prev = v
    runs.append((start, prev - start))
    return runs


def serialize_roaring(values: list[int] | set[int]) -> bytes:
    """Canonical portable serialization of a set of uint32 values.

    Per container the encoder picks whichever of run / array / bitmap
    serializes smallest (the spec's canonical choice); the run cookie
    (12347) with its run-flag bitset is emitted whenever any container
    is a run, and — per spec — the offset header is then included only
    when there are >= 4 containers."""
    vals = sorted(set(values))
    if vals and not 0 <= vals[0] <= vals[-1] <= 0xFFFFFFFF:
        raise ValueError("roaring: values must be uint32")
    # split into containers by high 16 bits
    containers: dict[int, list[int]] = {}
    for v in vals:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    bodies: list[bytes] = []
    cards: list[int] = []
    run_bits = bytearray((len(keys) + 7) // 8)
    any_run = False
    for i, k in enumerate(keys):
        vs = containers[k]
        runs = _runs_of(vs)
        run_size = 2 + 4 * len(runs)
        plain_size = 2 * len(vs) if len(vs) <= 4096 else 8192
        if run_size < plain_size:
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, l) for s, l in runs
            )
            run_bits[i >> 3] |= 1 << (i & 7)
            any_run = True
        elif len(vs) <= 4096:
            body = struct.pack(f"<{len(vs)}H", *vs)
        else:
            bits = bytearray(8192)
            for v in vs:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
        bodies.append(body)
        cards.append(len(vs))
    out: list[bytes]
    if any_run:
        out = [struct.pack("<HH", _COOKIE_RUN, len(keys) - 1), bytes(run_bits)]
        with_offsets = len(keys) >= _NO_OFFSET_THRESHOLD
    else:
        out = [struct.pack("<II", _COOKIE_NO_RUN, len(keys))]
        with_offsets = True  # mandatory for the no-run cookie
    for k, card in zip(keys, cards):
        out.append(struct.pack("<HH", k, card - 1))
    if with_offsets:
        pos = sum(len(b) for b in out) + 4 * len(keys)
        for b in bodies:
            out.append(struct.pack("<I", pos))
            pos += len(b)
    out.extend(bodies)
    return b"".join(out)


def deserialize_roaring(blob: bytes) -> list[int]:
    """Decode a portable 32-bit roaring bitmap to sorted values. Refuses
    malformed input with ValueError (the DV layer quarantines)."""
    vals, _consumed = _deserialize_counted(blob, 0)
    return vals


# ----------------------------------------------------------------------
# 64-bit bucketed extension (RoaringFormatSpec "portable format for
# 64-bit implementations"): uint64 LE bucket count, then per bucket a
# uint32 LE high-32-bit key followed by a nested 32-bit portable
# bitmap of the low 32 bits. Needed because a 100 TB corpus assigns
# more than 2^32 document ids.
# ----------------------------------------------------------------------


def serialize_roaring64(values: list[int] | set[int]) -> bytes:
    """Portable 64-bit serialization of a set of uint64 values."""
    vals = sorted(set(values))
    if vals and not 0 <= vals[0] <= vals[-1] <= 0xFFFFFFFFFFFFFFFF:
        raise ValueError("roaring64: values must be uint64")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = [struct.pack("<Q", len(buckets))]
    for hi in sorted(buckets):
        out.append(struct.pack("<I", hi))
        out.append(serialize_roaring(buckets[hi]))
    return b"".join(out)


def deserialize_roaring64(blob: bytes) -> list[int]:
    """Decode a portable 64-bit roaring bitmap to sorted values."""
    if len(blob) < 8:
        raise ValueError("roaring64: truncated bucket count")
    (n_buckets,) = struct.unpack_from("<Q", blob, 0)
    if n_buckets > (len(blob) - 8) // 4:
        raise ValueError("roaring64: bucket count overruns input")
    p = 8
    out: list[int] = []
    for _ in range(n_buckets):
        if p + 4 > len(blob):
            raise ValueError("roaring64: truncated bucket key")
        (hi,) = struct.unpack_from("<I", blob, p)
        p += 4
        # nested 32-bit map: measure its length by re-serializing the
        # decode (maps are canonical, so the round-trip length matches)
        vals32, consumed = _deserialize_counted(blob, p)
        p += consumed
        base = hi << 32
        out.extend(base + v for v in vals32)
    if p != len(blob):
        raise ValueError("roaring64: trailing bytes — quarantine")
    return out


def _deserialize_counted(blob: bytes, start: int) -> tuple[list[int], int]:
    """Decode one nested 32-bit map at ``start``; return (values,
    bytes consumed). Mirrors deserialize_roaring but tracks its end —
    the 64-bit framing stores no per-bucket length."""
    p = start
    if len(blob) < p + 8:
        raise ValueError("roaring: truncated header")
    cookie16 = struct.unpack_from("<H", blob, p)[0]
    if cookie16 == _COOKIE_RUN:
        n = (struct.unpack_from("<H", blob, p + 2)[0]) + 1
        flag_len = (n + 7) // 8
        run_flags = blob[p + 4 : p + 4 + flag_len]
        p += 4 + flag_len
        has_run = True
    else:
        cookie, n = struct.unpack_from("<II", blob, p)
        if cookie != _COOKIE_NO_RUN:
            raise ValueError(f"roaring: bad cookie {cookie}")
        run_flags = b""
        p += 8
        has_run = False
    keys_cards = []
    for _ in range(n):
        if p + 4 > len(blob):
            raise ValueError("roaring: truncated descriptive header")
        k, c1 = struct.unpack_from("<HH", blob, p)
        keys_cards.append((k, c1 + 1))
        p += 4
    if not has_run or n >= _NO_OFFSET_THRESHOLD:
        p += 4 * n
    out: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        is_run = has_run and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            if p + 2 > len(blob):
                raise ValueError("roaring: truncated run container")
            n_runs = struct.unpack_from("<H", blob, p)[0]
            p += 2
            if p + 4 * n_runs > len(blob):
                raise ValueError("roaring: truncated run container")
            for _ in range(n_runs):
                start_v, length1 = struct.unpack_from("<HH", blob, p)
                p += 4
                out.extend(base + v for v in range(start_v, start_v + length1 + 1))
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
    return out, p - start


# ----------------------------------------------------------------------
# bitmap index over a key column: the corpus-slicing structure a 100 TB
# curation pipeline keeps per tag/license/language — predicates
# evaluate as bitmap AND/OR/ANDNOT without ever shuffling documents.
# ----------------------------------------------------------------------


def build_bitmap_index(df, key_col: str, id_col: str, wide: bool = False):
    """Per-key serialized roaring bitmaps of the ids carrying that key.
    Scale shape: per-partition partial bitmaps (mapInPandas, one pass),
    then an OR-merge per key in a hash aggregate — the bitmap union is
    associative, so the merge is a normal combiner tree; document rows
    never shuffle, only the (tiny) bitmaps do. ``wide=True`` uses the
    portable 64-bit framing: a 100 TB corpus assigns more than 2^32
    document ids, so the 32-bit format is a silent ceiling.
    Returns a DataFrame (key, bitmap binary, cardinality long)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    ser = serialize_roaring64 if wide else serialize_roaring
    des = deserialize_roaring64 if wide else deserialize_roaring

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict[str, set] = {}
            for k, i in zip(pdf[key_col], pdf[id_col]):
                acc.setdefault(str(k), set()).add(int(i))
            yield pd.DataFrame(
                {
                    "key": list(acc),
                    "bitmap": [ser(v) for v in acc.values()],
                }
            )

    def merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict[str, set] = {}
            for k, b in zip(pdf["key"], pdf["bitmap"]):
                acc.setdefault(k, set()).update(des(bytes(b)))
            yield pd.DataFrame(
                {
                    "key": list(acc),
                    "bitmap": [ser(v) for v in acc.values()],
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


def bitmap_slice(
    index_rows: list[tuple[str, bytes]], expr: list, wide: bool = False
) -> list[int]:
    """Evaluate a slice predicate against collected index rows (the
    index is metadata-scale: one row per tag). ``expr`` is a prefix
    list: ["and"|"or"|"andnot", a, b] with leaves as key strings."""
    des = deserialize_roaring64 if wide else deserialize_roaring
    bitmaps = {k: set(des(bytes(b))) for k, b in index_rows}

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
