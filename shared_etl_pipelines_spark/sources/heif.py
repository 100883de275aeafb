"""HEIF/HEIC item parsing (ISO/IEC 23008-12 over ISO-BMFF) — the
modern phone-photo container a crawl meets wherever people upload
images.

Reuses this repo's ISO-BMFF box machinery (``sources/mp4.py``) and its
HEVC decoder-configuration parser: a HEIC file is a ``meta`` box world
— item infos (``iinf``/``infe``), item locations (``iloc`` extents,
validated against the file), the primary item (``pitm``), and item
properties (``iprp``: ``ipco`` property pool + ``ipma`` associations)
— ``ispe`` pixel dimensions and the same ``hvcC`` record the MP4 walk
parses, so HEIC primaries yield REAL HEVC profile/level here too.
``grid`` derived items decode their rows/cols/canvas payload.

Strictness: out-of-range property associations, extents that overrun
the file, truncated payloads and unknown iloc construction methods all
raise ``ValueError`` — callers quarantine, never guess.

Writer builds canonical fixtures (hvc1 primary + thumbnail, Exif
metadata item, grid derived item).
"""
from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.mp4 import (
    _box,
    _boxes,
    _full,
    _fullbox,
    encode_hevc_sps,
    encode_hvcc,
    parse_hvcc,
)

__all__ = ["is_heif", "parse_heif", "encode_heif"]


def is_heif(blob: bytes) -> bool:
    return (
        len(blob) >= 12
        and blob[4:8] == b"ftyp"
        and blob[8:12] in (b"heic", b"mif1", b"heix")
    )


# ----------------------------------------------------------------------
# parser
# ----------------------------------------------------------------------
def _parse_iloc(data: bytes, b: int, e: int) -> dict[int, tuple[int, int]]:
    version, _, p = _full(data, b)
    if version > 1:
        raise ValueError(f"heif: iloc version {version} unsupported")
    sizes = data[p]
    offset_size, length_size = sizes >> 4, sizes & 0xF
    base_size = data[p + 1] >> 4
    (count,) = struct.unpack_from(">H", data, p + 2)
    p += 4
    out: dict[int, tuple[int, int]] = {}

    def read_n(pos: int, n: int) -> tuple[int, int]:
        if n == 0:
            return 0, pos
        if pos + n > len(data):
            raise ValueError("heif: iloc field truncated — quarantine")
        return int.from_bytes(data[pos : pos + n], "big"), pos + n

    for _ in range(count):
        (item_id,) = struct.unpack_from(">H", data, p)
        p += 2
        if version == 1:
            (cm,) = struct.unpack_from(">H", data, p)
            if cm & 0xF:
                raise ValueError("heif: iloc construction method unsupported")
            p += 2
        p += 2  # data_reference_index
        base, p = read_n(p, base_size)
        (n_ext,) = struct.unpack_from(">H", data, p)
        p += 2
        if n_ext != 1:
            raise ValueError("heif: multi-extent items unsupported")
        off, p = read_n(p, offset_size)
        ln, p = read_n(p, length_size)
        out[item_id] = (base + off, ln)
    return out


def parse_heif(blob: bytes) -> dict:
    """Returns {brand, primary_id, items: [...]}. Each item:
    ``item_id, item_type, is_primary, width, height, n_bytes`` plus
    HEVC profile/level/tier for hvc1 items carrying hvcC, and
    ``grid_rows/grid_cols`` for grid items. Every malformation —
    including fixed-width field truncation — surfaces as ValueError,
    never a bare struct.error, so wrappers quarantine uniformly."""
    try:
        return _parse_heif(blob)
    except struct.error as e:
        raise ValueError(f"heif: truncated fixed field — quarantine ({e})") from e


def _parse_heif(blob: bytes) -> dict:
    if not is_heif(blob):
        raise ValueError("not a HEIF (bad ftyp brand) — quarantine")
    brand = blob[8:12].decode("latin-1")
    meta_span = None
    for btype, b, e in _boxes(blob, 0, len(blob)):
        if btype == b"meta":
            meta_span = (b, e)
    if meta_span is None:
        raise ValueError("heif: no meta box — quarantine")
    _, _, mb = _full(blob, meta_span[0])
    primary = None
    infos: list[tuple[int, str]] = []
    locs: dict[int, tuple[int, int]] = {}
    props: list[tuple[bytes, int, int]] = []
    assoc: dict[int, list[int]] = {}
    for btype, b, e in _boxes(blob, mb, meta_span[1]):
        if btype == b"pitm":
            _, _, p = _full(blob, b)
            (primary,) = struct.unpack_from(">H", blob, p)
        elif btype == b"iinf":
            _, _, p = _full(blob, b)
            p += 2  # entry_count (uint16 in v0)
            for itype, ib, ie in _boxes(blob, p, e):
                if itype != b"infe":
                    continue
                ver, _, ip = _full(blob, ib)
                if ver < 2:
                    raise ValueError("heif: infe version < 2 unsupported")
                (item_id,) = struct.unpack_from(">H", blob, ip)
                fourcc = blob[ip + 4 : ip + 8].decode("latin-1")
                infos.append((item_id, fourcc))
        elif btype == b"iloc":
            locs = _parse_iloc(blob, b, e)
        elif btype == b"iprp":
            for ptype, pb, pe in _boxes(blob, b, e):
                if ptype == b"ipco":
                    props = list(_boxes(blob, pb, pe))
                elif ptype == b"ipma":
                    _, _, ap = _full(blob, pb)
                    (n_entries,) = struct.unpack_from(">I", blob, ap)
                    ap += 4
                    for _ in range(n_entries):
                        (item_id,) = struct.unpack_from(">H", blob, ap)
                        n_assoc = blob[ap + 2]
                        ap += 3
                        idxs = []
                        for _ in range(n_assoc):
                            idxs.append(blob[ap] & 0x7F)
                            ap += 1
                        assoc[item_id] = idxs
    if primary is None or not infos:
        raise ValueError("heif: meta missing pitm/iinf — quarantine")
    items = []
    for item_id, fourcc in infos:
        off, ln = locs.get(item_id, (0, 0))
        if off + ln > len(blob):
            raise ValueError("heif: item extent overruns file — quarantine")
        payload = blob[off : off + ln]
        it = {
            "item_id": item_id,
            "item_type": fourcc,
            "payload": payload,
            "is_primary": item_id == primary,
            "width": 0,
            "height": 0,
            "n_bytes": ln,
            "hevc_profile": 0,
            "hevc_level": 0,
            "hevc_tier": 0,
            "grid_rows": 0,
            "grid_cols": 0,
        }
        for idx in assoc.get(item_id, []):
            if not 1 <= idx <= len(props):
                raise ValueError("heif: ipma property index out of range")
            ptype, pb, pe = props[idx - 1]
            if ptype == b"ispe":
                _, _, sp = _full(blob, pb)
                it["width"], it["height"] = struct.unpack_from(
                    ">II", blob, sp
                )
            elif ptype == b"hvcC":
                cfg = parse_hvcc(blob[pb:pe])
                it["hevc_profile"] = cfg["profile_idc"]
                it["hevc_level"] = cfg["level_idc"]
                it["hevc_tier"] = cfg["tier_flag"]
        if fourcc == "grid":
            if len(payload) < 8:
                raise ValueError("heif: grid payload truncated — quarantine")
            flags = payload[1]
            it["grid_rows"] = payload[2] + 1
            it["grid_cols"] = payload[3] + 1
            fw = 4 if flags & 1 else 2
            it["width"], it["height"] = (
                int.from_bytes(payload[4 : 4 + fw], "big"),
                int.from_bytes(payload[4 + fw : 4 + 2 * fw], "big"),
            )
        items.append(it)
    return {"brand": brand, "primary_id": primary, "items": items}


# ----------------------------------------------------------------------
# writer (fixtures)
# ----------------------------------------------------------------------
def encode_heif(
    items: list[dict],
    primary_id: int,
    brand: bytes = b"heic",
) -> bytes:
    """items: dicts with ``item_id``, ``item_type`` (4cc str),
    ``payload`` bytes, optional ``ispe`` (w, h) and ``hvcc``
    (profile, level, tier) properties."""
    if not items:
        raise ValueError("heif: at least one item required")
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    infe = b""
    for it in items:
        infe += _fullbox(
            b"infe", 2, 0,
            struct.pack(">HH", it["item_id"], 0)
            + it["item_type"].encode("latin-1")[:4].ljust(4)
            + b"\x00",
        )
    iinf = _fullbox(b"iinf", 0, 0, struct.pack(">H", len(items)) + infe)
    pitm = _fullbox(b"pitm", 0, 0, struct.pack(">H", primary_id))

    props: list[bytes] = []
    assoc_entries = b""
    for it in items:
        idxs = []
        if "ispe" in it:
            props.append(
                _fullbox(
                    b"ispe", 0, 0, struct.pack(">II", *it["ispe"])
                )
            )
            idxs.append(len(props))
        if "hvcc" in it:
            hp, hl, ht = it["hvcc"]
            bd = 10 if hp == 2 else 8
            w, h = it.get("ispe", (64, 64))
            sps = encode_hevc_sps(w, h, hp, hl, ht, 1, bd)
            props.append(
                _box(b"hvcC", encode_hvcc(sps, hp, hl, ht, 1, bd))
            )
            idxs.append(len(props))
        assoc_entries += struct.pack(">H", it["item_id"])
        assoc_entries += bytes([len(idxs)]) + bytes(
            [0x80 | i for i in idxs]
        )
    ipco = _box(b"ipco", b"".join(props))
    ipma = _fullbox(
        b"ipma", 0, 0, struct.pack(">I", len(items)) + assoc_entries
    )
    iprp = _box(b"iprp", ipco + ipma)

    # iloc with 4-byte offsets/lengths; offsets patched after assembly
    payloads = [it["payload"] for it in items]
    iloc_body = bytearray(b"\x44\x00" + struct.pack(">H", len(items)))
    for it in items:
        iloc_body += struct.pack(">HH", it["item_id"], 0)
        iloc_body += struct.pack(">H", 1)  # one extent
        iloc_body += b"\x00" * 8  # offset+length placeholders
    iloc = _fullbox(b"iloc", 0, 0, bytes(iloc_body))
    hdlr = _fullbox(
        b"hdlr", 0, 0, b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"\x00"
    )
    meta = _fullbox(b"meta", 0, 0, hdlr + pitm + iinf + iloc + iprp)
    mdat = _box(b"mdat", b"".join(payloads))
    out = bytearray(ftyp + meta + mdat)
    # patch extents: find iloc placeholders inside the assembled file
    mdat_body = len(ftyp) + len(meta) + 8
    iloc_at = bytes(out).find(b"iloc") + 4  # fullbox header follows
    p = iloc_at + 4 + 4  # version/flags + sizes + count
    off = mdat_body
    for payload in payloads:
        p += 6  # item_id + dref + extent_count
        struct.pack_into(">II", out, p, off, len(payload))
        p += 8
        off += len(payload)
    return bytes(out)
