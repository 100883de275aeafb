"""EXIF APP1 metadata parse — TIFF IFD walk, GPS IFD, both byte
orders; the camera-metadata census of a crawled-image corpus.

EXIF (public spec: CIPA DC-008 / ISO 12234, structurally TIFF 6.0) is
carried in a JPEG APP1 segment: ``Exif\\0\\0`` + a TIFF header (II/MM
byte order) + IFD0, whose tag 34853 points at the GPS IFD. For an LLM
training-data pipeline this is first-order PII surface: embedded GPS
rationals geolocate the photographer, so a curation pass must SEE them
to strip or quarantine. This module reads IFD0's identity tags
(Make/Model/Orientation/DateTime) and the GPS latitude/longitude
rationals, reporting raw integer components (degrees, minutes,
centi-seconds, hemisphere refs) — no float conversion, so the audit is
exactly replayable. Malformed structures (entry counts or value
offsets overrunning the segment, unknown byte orders, bad rational
denominators) raise ValueError — callers quarantine, never guess.

Only the fields the audit needs are decoded; unknown tags are counted
and skipped, which is what keeps the walk safe on arbitrary crawl
data.
"""

from __future__ import annotations

import struct

__all__ = ["parse_exif_app1", "encode_exif_app1"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


class _Tiff:
    def __init__(self, data: bytes):
        if len(data) < 8:
            raise ValueError("TIFF header truncated")
        if data[:2] == b"II":
            self.fmt = "<"
        elif data[:2] == b"MM":
            self.fmt = ">"
        else:
            raise ValueError(f"unknown TIFF byte order {data[:2]!r}")
        (magic,) = struct.unpack_from(self.fmt + "H", data, 2)
        if magic != 42:
            raise ValueError(f"TIFF magic {magic} != 42")
        self.data = data

    def u16(self, off: int) -> int:
        if off + 2 > len(self.data):
            raise ValueError("TIFF read past end")
        return struct.unpack_from(self.fmt + "H", self.data, off)[0]

    def u32(self, off: int) -> int:
        if off + 4 > len(self.data):
            raise ValueError("TIFF read past end")
        return struct.unpack_from(self.fmt + "I", self.data, off)[0]

    def ifd_entries(self, off: int):
        n = self.u16(off)
        if off + 2 + 12 * n > len(self.data):
            raise ValueError("IFD entry table overruns the segment")
        for i in range(n):
            e = off + 2 + 12 * i
            tag = self.u16(e)
            typ = self.u16(e + 2)
            cnt = self.u32(e + 4)
            yield tag, typ, cnt, e + 8

    def value_bytes(self, typ: int, cnt: int, slot: int) -> bytes:
        if typ not in _TYPE_SIZES:
            raise ValueError(f"unsupported TIFF value type {typ}")
        size = _TYPE_SIZES[typ] * cnt
        off = slot if size <= 4 else self.u32(slot)
        if off + size > len(self.data):
            raise ValueError("TIFF value overruns the segment")
        return self.data[off : off + size]

    def ascii(self, typ: int, cnt: int, slot: int) -> str:
        if typ != 2:
            raise ValueError(f"expected ASCII tag, got type {typ}")
        raw = self.value_bytes(typ, cnt, slot)
        return raw.split(b"\x00", 1)[0].decode("ascii", "strict")

    def short(self, typ: int, cnt: int, slot: int) -> int:
        if typ != 3 or cnt != 1:
            raise ValueError("expected a single SHORT")
        return struct.unpack(self.fmt + "H", self.value_bytes(typ, 1, slot))[0]

    def rationals(self, typ: int, cnt: int, slot: int) -> list[tuple[int, int]]:
        if typ != 5:
            raise ValueError(f"expected RATIONAL tag, got type {typ}")
        raw = self.value_bytes(typ, cnt, slot)
        out = []
        for i in range(cnt):
            num, den = struct.unpack_from(self.fmt + "II", raw, 8 * i)
            if den == 0:
                raise ValueError("RATIONAL with zero denominator")
            out.append((num, den))
        return out


def _dms_components(r: list[tuple[int, int]]) -> tuple[int, int, int]:
    """GPS rationals -> (degrees, minutes, centi-seconds), refusing
    shapes the exact audit cannot represent (non-integral deg/min,
    seconds denominator not a divisor of 100)."""
    if len(r) != 3:
        raise ValueError(f"GPS coordinate with {len(r)} rationals, not 3")
    (dn, dd), (mn, md), (sn, sd) = r
    if dn % dd or mn % md:
        raise ValueError("non-integral GPS degrees/minutes")
    if 100 % sd:
        raise ValueError(f"GPS seconds denominator {sd} not a divisor of 100")
    return dn // dd, mn // md, sn * (100 // sd)


def parse_exif_app1(body: bytes) -> dict:
    """APP1 payload -> identity + GPS census. ``body`` starts at the
    APP1 segment payload (``Exif\\0\\0...``)."""
    if body[:6] != b"Exif\x00\x00":
        raise ValueError("APP1 segment is not EXIF")
    t = _Tiff(body[6:])
    ifd0 = t.u32(4)
    out: dict = {
        "orientation": 0, "make": "", "model": "", "datetime": "",
        "n_tags": 0, "has_gps": False,
        "lat_deg": 0, "lat_min": 0, "lat_sec_centi": 0, "lat_ref": "",
        "lon_deg": 0, "lon_min": 0, "lon_sec_centi": 0, "lon_ref": "",
    }
    gps_off = None
    for tag, typ, cnt, slot in t.ifd_entries(ifd0):
        out["n_tags"] += 1
        if tag == 271:
            out["make"] = t.ascii(typ, cnt, slot)
        elif tag == 272:
            out["model"] = t.ascii(typ, cnt, slot)
        elif tag == 274:
            out["orientation"] = t.short(typ, cnt, slot)
        elif tag == 306:
            out["datetime"] = t.ascii(typ, cnt, slot)
        elif tag == 34853:
            if typ != 4 or cnt != 1:
                raise ValueError("GPS IFD pointer must be a single LONG")
            gps_off = t.u32(slot)
    if gps_off is not None:
        out["has_gps"] = True
        for tag, typ, cnt, slot in t.ifd_entries(gps_off):
            if tag == 1:
                out["lat_ref"] = t.ascii(typ, cnt, slot)
            elif tag == 2:
                d, m, s = _dms_components(t.rationals(typ, cnt, slot))
                out["lat_deg"], out["lat_min"], out["lat_sec_centi"] = d, m, s
            elif tag == 3:
                out["lon_ref"] = t.ascii(typ, cnt, slot)
            elif tag == 4:
                d, m, s = _dms_components(t.rationals(typ, cnt, slot))
                out["lon_deg"], out["lon_min"], out["lon_sec_centi"] = d, m, s
    return out


def _entry(fmt: str, tag: int, typ: int, cnt: int, val: bytes) -> bytes:
    assert len(val) <= 4
    return struct.pack(fmt + "HHI", tag, typ, cnt) + val.ljust(4, b"\x00")


def encode_exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime: str,
    gps: "tuple | None" = None,
    big_endian: bool = False,
) -> bytes:
    """A real EXIF APP1 payload for fixtures, both byte orders. ``gps``
    = (lat_deg, lat_min, lat_sec_centi, lat_ref, lon_deg, lon_min,
    lon_sec_centi, lon_ref) or None."""
    fmt = ">" if big_endian else "<"
    order = b"MM" if big_endian else b"II"

    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"
    dt_b = datetime.encode() + b"\x00"
    n0 = 4 + (1 if gps is not None else 0)
    ifd0_off = 8
    # out-of-line value area starts after IFD0 (entries + next-IFD word)
    data_off = ifd0_off + 2 + 12 * n0 + 4
    blobs: list[bytes] = []

    def outline(raw: bytes) -> int:
        nonlocal data_off
        off = data_off
        blobs.append(raw)
        data_off += len(raw)
        return off

    entries = []
    for tag, s in ((271, make_b), (272, model_b)):
        if len(s) <= 4:
            entries.append(_entry(fmt, tag, 2, len(s), s))
        else:
            entries.append(
                _entry(fmt, tag, 2, len(s), struct.pack(fmt + "I", outline(s)))
            )
    entries.append(_entry(fmt, 274, 3, 1, struct.pack(fmt + "H", orientation)))
    entries.append(
        _entry(fmt, 306, 2, len(dt_b), struct.pack(fmt + "I", outline(dt_b)))
    )
    gps_ptr_slot = len(entries)
    if gps is not None:
        entries.append(b"")  # patched below once the GPS offset is known
    ifd0 = struct.pack(fmt + "H", n0)
    gps_ifd = b""
    if gps is not None:
        lat_d, lat_m, lat_sc, lat_r, lon_d, lon_m, lon_sc, lon_r = gps
        gps_off = data_off
        gn = 4
        gdata_off = gps_off + 2 + 12 * gn + 4

        def rat3(d: int, m: int, sc: int) -> bytes:
            return struct.pack(fmt + "6I", d, 1, m, 1, sc, 100)

        lat_raw, lon_raw = rat3(lat_d, lat_m, lat_sc), rat3(lon_d, lon_m, lon_sc)
        gentries = [
            _entry(fmt, 1, 2, 2, lat_r.encode() + b"\x00"),
            _entry(fmt, 2, 5, 3, struct.pack(fmt + "I", gdata_off)),
            _entry(fmt, 3, 2, 2, lon_r.encode() + b"\x00"),
            _entry(
                fmt, 4, 5, 3, struct.pack(fmt + "I", gdata_off + len(lat_raw))
            ),
        ]
        gps_ifd = (
            struct.pack(fmt + "H", gn)
            + b"".join(gentries)
            + struct.pack(fmt + "I", 0)
            + lat_raw
            + lon_raw
        )
        entries[gps_ptr_slot] = _entry(
            fmt, 34853, 4, 1, struct.pack(fmt + "I", gps_off)
        )
    tiff = (
        order
        + struct.pack(fmt + "HI", 42, ifd0_off)
        + ifd0
        + b"".join(entries)
        + struct.pack(fmt + "I", 0)
        + b"".join(blobs)
        + gps_ifd
    )
    return b"Exif\x00\x00" + tiff
