"""Matroska / WebM container walk — pure-Python EBML, public spec only.

Implements the subset of RFC 8794 (EBML) + the Matroska/WebM element
registry that a crawl-video CORPUS AUDIT needs: per-track type / codec
/ dimensions / audio parameters, a block census with keyframe counts
(SimpleBlock flag bit; BlockGroup keyframe = no ReferenceBlock, per
spec), and container duration from Info. Also a VP8 keyframe-header
bitstream parse (RFC 6386 §9.1) so the dominant WebM video codec
yields REAL coded dimensions, not just container metadata — the same
"scan what you cannot decode, loudly" contract as ``sources/mp4.py``
(no reference counterpart; LLM-pipeline mandate — the reference corpus
has no video ingestion at all).

Strictness contract (shared with every codec module in this repo):
malformed input raises ``ValueError`` and the Spark-side wrapper
quarantines the blob as a visible row — never a silent skip, never a
guessed field. Unknown-size elements are supported exactly where real
streaming muxers emit them (Segment, Cluster); anywhere else they are
a structural error.

Writer (`encode_mkv`) exists for deterministic fixtures and roundtrip
tests; it emits minimal-length VINTs and canonical element order.
"""
from __future__ import annotations

import struct

# --- element IDs (Matroska registry; IDs include their marker bits) ----
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_HZ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REF_BLOCK = 0xFB
_BLOCK_DURATION = 0x9B
_SEEK_HEAD = 0x114D9B74
_CUES = 0x1C53BB6B
_CHAPTERS = 0x1043A770
_TAGS = 0x1254C367
_ATTACHMENTS = 0x1941A469
_VOID = 0xEC
_CRC32 = 0xBF

_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}

# elements that may legally follow/terminate an unknown-size Cluster
_SEGMENT_LEVEL = {
    _CLUSTER, _CUES, _CHAPTERS, _TAGS, _ATTACHMENTS, _SEEK_HEAD,
    _INFO, _TRACKS,
}
_CLUSTER_CHILDREN = {
    _CLUSTER_TS, _SIMPLE_BLOCK, _BLOCK_GROUP, _VOID, _CRC32,
    0xAB,  # PrevSize
    0xA7,  # Position
    0x5854,  # SilentTracks
}


# ----------------------------------------------------------------------
# EBML primitives
# ----------------------------------------------------------------------
def _read_id(buf: bytes, pos: int) -> tuple[int, int]:
    """Element ID: 1-4 byte VINT, marker bits KEPT (RFC 8794 §5)."""
    if pos >= len(buf):
        raise ValueError("EBML: truncated element id — quarantine")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("EBML: invalid element id lead byte 0x00")
    n = 8 - b0.bit_length() + 1
    if n > 4:
        raise ValueError("EBML: element id longer than 4 bytes")
    if pos + n > len(buf):
        raise ValueError("EBML: truncated element id — quarantine")
    v = 0
    for i in range(n):
        v = (v << 8) | buf[pos + i]
    return v, n


def _read_size(buf: bytes, pos: int) -> tuple[int | None, int]:
    """Element size VINT, marker stripped; all-ones payload = unknown
    size → returns (None, nbytes)."""
    if pos >= len(buf):
        raise ValueError("EBML: truncated size — quarantine")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("EBML: invalid size lead byte 0x00")
    n = 8 - b0.bit_length() + 1
    if pos + n > len(buf):
        raise ValueError("EBML: truncated size — quarantine")
    v = b0 & (0xFF >> n)
    for i in range(1, n):
        v = (v << 8) | buf[pos + i]
    if v == (1 << (7 * n)) - 1:  # VINT_DATA all ones = unknown
        return None, n
    return v, n


def _vint(v: int) -> bytes:
    """Minimal-length size VINT (writer)."""
    if v < 0:
        raise ValueError("EBML: negative size")
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:  # all-ones reserved for unknown
            out = bytearray(n)
            out[0] = (1 << (8 - n)) | (v >> (8 * (n - 1))) & 0xFF
            for i in range(1, n):
                out[i] = (v >> (8 * (n - 1 - i))) & 0xFF
            return bytes(out)
    raise ValueError("EBML: size too large for 8-byte VINT")


def _id_bytes(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + _vint(len(payload)) + payload


def _uint(v: int) -> bytes:
    if v == 0:
        return b"\x00"
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def _parse_uint(p: bytes) -> int:
    if len(p) > 8:
        raise ValueError("EBML: uint wider than 8 bytes")
    return int.from_bytes(p, "big")


def _parse_float(p: bytes) -> float:
    if len(p) == 4:
        return struct.unpack(">f", p)[0]
    if len(p) == 8:
        return struct.unpack(">d", p)[0]
    if len(p) == 0:
        return 0.0
    raise ValueError("EBML: float element must be 0/4/8 bytes")


def _children(buf: bytes, start: int, end: int):
    """Iterate (id, payload_start, payload_end) over a master element's
    children; raises on truncation or child overrun."""
    pos = start
    while pos < end:
        eid, n = _read_id(buf, pos)
        size, m = _read_size(buf, pos + n)
        if size is None:
            raise ValueError(
                f"EBML: unknown-size child 0x{eid:X} outside "
                "Segment/Cluster — quarantine"
            )
        body = pos + n + m
        if body + size > end:
            raise ValueError("EBML: child element overruns parent")
        yield eid, body, body + size
        pos = body + size


# ----------------------------------------------------------------------
# Block parsing
# ----------------------------------------------------------------------
def _parse_block(buf: bytes, start: int, end: int) -> tuple[int, int, int, int]:
    """(Simple)Block header: track VINT + int16 rel-ts + flags byte.
    Returns (track_number, rel_ts, flags, payload_start)."""
    size, n = _read_size(buf, start)
    if size is None:
        raise ValueError("Block: unknown-size track number")
    if start + n + 3 > end:
        raise ValueError("Block: truncated header — quarantine")
    rel = struct.unpack(">h", buf[start + n : start + n + 2])[0]
    flags = buf[start + n + 2]
    lacing = (flags >> 1) & 0x3
    if lacing != 0:
        raise ValueError("Block: laced frames unsupported — quarantine")
    return size, rel, flags, start + n + 3


# ----------------------------------------------------------------------
# Container walk
# ----------------------------------------------------------------------
def is_mkv(blob: bytes) -> bool:
    return len(blob) >= 4 and blob[:4] == b"\x1aE\xdf\xa3"


def parse_mkv(blob: bytes, collect_frames: bool = False) -> dict:
    """Walk an entire Matroska/WebM file.

    Returns ``{doc_type, timestamp_scale, duration_ms, tracks: [...]}``;
    each track dict carries ``track_id`` (TrackNumber), ``track_type``,
    ``codec_id``, ``width``/``height`` (video), ``sample_hz``/
    ``channels`` (audio), ``n_blocks``, ``n_keyframes`` and — when
    ``collect_frames`` — the raw ``frames`` list of
    ``(block_idx, keyframe, payload_bytes)``.

    Malformed structure raises ``ValueError`` (the Spark wrapper
    quarantines). Unknown-size Segment extends to EOF; unknown-size
    Cluster ends at the next segment-level element id — both are what
    live-streaming muxers emit (RFC 8794 §6.2 / Matroska §27).
    """
    if not is_mkv(blob):
        raise ValueError("not an EBML stream — quarantine")
    eid, n = _read_id(blob, 0)
    size, m = _read_size(blob, n)
    if size is None:
        raise ValueError("EBML header must have a known size")
    doc_type = "matroska"  # registry default when DocType absent
    for cid, s, e in _children(blob, n + m, n + m + size):
        if cid == _DOCTYPE:
            doc_type = blob[s:e].decode("utf-8", "strict")
    if doc_type not in ("matroska", "webm"):
        raise ValueError(f"EBML: unsupported DocType {doc_type!r} — quarantine")

    pos = n + m + size
    eid, n2 = _read_id(blob, pos)
    if eid != _SEGMENT:
        raise ValueError("EBML: expected Segment after header — quarantine")
    seg_size, m2 = _read_size(blob, pos + n2)
    seg_start = pos + n2 + m2
    seg_end = len(blob) if seg_size is None else seg_start + seg_size
    if seg_end > len(blob):
        raise ValueError("EBML: Segment overruns file — quarantine")

    timestamp_scale = 1_000_000
    duration_raw = None
    tracks: dict[int, dict] = {}

    def walk_info(s: int, e: int) -> None:
        nonlocal timestamp_scale, duration_raw
        for cid, cs, ce in _children(blob, s, e):
            if cid == _TS_SCALE:
                timestamp_scale = _parse_uint(blob[cs:ce])
            elif cid == _DURATION:
                duration_raw = _parse_float(blob[cs:ce])

    def walk_tracks(s: int, e: int) -> None:
        for cid, cs, ce in _children(blob, s, e):
            if cid != _TRACK_ENTRY:
                continue
            t = {
                "track_id": None, "track_type": "", "codec_id": "",
                "width": 0, "height": 0, "sample_hz": 0, "channels": 0,
                "codec_private": b"", "n_blocks": 0, "n_keyframes": 0,
                "frames": [] if collect_frames else None,
                "cues": [] if collect_frames else None,
            }
            for fid, fs, fe in _children(blob, cs, ce):
                p = blob[fs:fe]
                if fid == _TRACK_NUMBER:
                    t["track_id"] = _parse_uint(p)
                elif fid == _TRACK_TYPE:
                    tt = _parse_uint(p)
                    t["track_type"] = _TRACK_TYPES.get(tt, str(tt))
                elif fid == _CODEC_ID:
                    t["codec_id"] = p.decode("utf-8", "strict")
                elif fid == _CODEC_PRIVATE:
                    t["codec_private"] = p
                elif fid == _VIDEO:
                    for vid, vs, ve in _children(blob, fs, fe):
                        if vid == _PIXEL_W:
                            t["width"] = _parse_uint(blob[vs:ve])
                        elif vid == _PIXEL_H:
                            t["height"] = _parse_uint(blob[vs:ve])
                elif fid == _AUDIO:
                    for aid, as_, ae in _children(blob, fs, fe):
                        if aid == _SAMPLE_HZ:
                            t["sample_hz"] = int(_parse_float(blob[as_:ae]))
                        elif aid == _CHANNELS:
                            t["channels"] = _parse_uint(blob[as_:ae])
            if t["track_id"] is None:
                raise ValueError("TrackEntry missing TrackNumber — quarantine")
            if t["track_id"] in tracks:
                raise ValueError("duplicate TrackNumber — quarantine")
            tracks[t["track_id"]] = t

    def record(
        tn: int,
        key: bool,
        payload: bytes,
        abs_ts: int | None = None,
        duration: int | None = None,
    ) -> None:
        t = tracks.get(tn)
        if t is None:
            raise ValueError(f"block references unknown track {tn} — quarantine")
        if collect_frames:
            t["frames"].append((t["n_blocks"], key, payload))
            if duration is not None:
                t["cues"].append((abs_ts, duration, payload))
        t["n_blocks"] += 1
        t["n_keyframes"] += 1 if key else 0

    def handle_group(s: int, e: int, cluster_ts: int) -> None:
        tn = None
        rel = 0
        has_ref = False
        duration = None
        payload = b""
        for gid, gs, ge in _children(blob, s, e):
            if gid == _BLOCK:
                tn, rel, _flags, ps = _parse_block(blob, gs, ge)
                payload = blob[ps:ge]
            elif gid == _REF_BLOCK:
                has_ref = True
            elif gid == _BLOCK_DURATION:
                duration = _parse_uint(blob[gs:ge])
        if tn is None:
            raise ValueError("BlockGroup without Block — quarantine")
        # per Matroska spec: keyframe iff no ReferenceBlock
        record(tn, not has_ref, payload, cluster_ts + rel, duration)

    def walk_cluster_children(s: int, e: int) -> None:
        cluster_ts = 0
        for cid, cs, ce in _children(blob, s, e):
            if cid == _CLUSTER_TS:
                cluster_ts = _parse_uint(blob[cs:ce])
            elif cid == _SIMPLE_BLOCK:
                tn, rel, flags, ps = _parse_block(blob, cs, ce)
                record(
                    tn, bool(flags & 0x80), blob[ps:ce], cluster_ts + rel
                )
            elif cid == _BLOCK_GROUP:
                handle_group(cs, ce, cluster_ts)

    def walk_unknown_cluster(s: int, hard_end: int) -> int:
        """Unknown-size Cluster: children until a segment-level id."""
        pos = s
        cluster_ts = 0
        while pos < hard_end:
            eid, n = _read_id(blob, pos)
            if eid in _SEGMENT_LEVEL:
                return pos
            if eid not in _CLUSTER_CHILDREN:
                raise ValueError(
                    f"unknown-size Cluster: unexpected child 0x{eid:X}"
                )
            size, m = _read_size(blob, pos + n)
            if size is None:
                raise ValueError("unknown-size child inside Cluster")
            body = pos + n + m
            if body + size > hard_end:
                raise ValueError("Cluster child overruns Segment")
            if eid == _CLUSTER_TS:
                cluster_ts = _parse_uint(blob[body : body + size])
            elif eid == _SIMPLE_BLOCK:
                tn, rel, flags, ps = _parse_block(blob, body, body + size)
                record(
                    tn, bool(flags & 0x80), blob[ps : body + size],
                    cluster_ts + rel,
                )
            elif eid == _BLOCK_GROUP:
                handle_group(body, body + size, cluster_ts)
            pos = body + size
        return hard_end

    # segment-level walk (handles unknown-size Segment AND Clusters)
    pos = seg_start
    seen_info = seen_tracks = False
    while pos < seg_end:
        eid, n = _read_id(blob, pos)
        size, m = _read_size(blob, pos + n)
        body = pos + n + m
        if size is None:
            if eid != _CLUSTER:
                raise ValueError(
                    f"unknown-size element 0x{eid:X} at segment level"
                )
            pos = walk_unknown_cluster(body, seg_end)
            continue
        if body + size > seg_end:
            raise ValueError("EBML: segment child overruns — quarantine")
        if eid == _INFO:
            seen_info = True
            walk_info(body, body + size)
        elif eid == _TRACKS:
            seen_tracks = True
            walk_tracks(body, body + size)
        elif eid == _CLUSTER:
            if not seen_tracks:
                raise ValueError("Cluster before Tracks — quarantine")
            walk_cluster_children(body, body + size)
        pos = body + size
    if not (seen_info and seen_tracks):
        raise ValueError("Segment missing Info/Tracks — quarantine")

    duration_ms = (
        int(round(duration_raw * timestamp_scale / 1_000_000.0))
        if duration_raw is not None
        else 0
    )
    return {
        "doc_type": doc_type,
        "timestamp_scale": timestamp_scale,
        "duration_ms": duration_ms,
        "tracks": [tracks[k] for k in sorted(tracks)],
    }


# ----------------------------------------------------------------------
# VP8 keyframe header (RFC 6386 §9.1) — the bitstream-level dims
# ----------------------------------------------------------------------
def parse_vp8_frame(payload: bytes) -> dict:
    """Decode the VP8 uncompressed frame tag (+ keyframe start code and
    coded dimensions for keyframes). Raises on truncation or a bad
    start code — never guesses."""
    if len(payload) < 3:
        raise ValueError("VP8: truncated frame tag — quarantine")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    out = {
        "keyframe": (tag & 1) == 0,
        "version": (tag >> 1) & 0x7,
        "show_frame": bool((tag >> 4) & 1),
        "part_size": tag >> 5,
        "width": 0,
        "height": 0,
    }
    if out["keyframe"]:
        if len(payload) < 10:
            raise ValueError("VP8: truncated keyframe header — quarantine")
        if payload[3:6] != b"\x9d\x01\x2a":
            raise ValueError("VP8: bad keyframe start code — quarantine")
        w = payload[6] | (payload[7] << 8)
        h = payload[8] | (payload[9] << 8)
        out["width"] = w & 0x3FFF
        out["height"] = h & 0x3FFF
    return out


def encode_vp8_keyframe(
    width: int, height: int, part_size: int, filler: bytes = b""
) -> bytes:
    """Minimal VALID VP8 keyframe header (tag + start code + dims) with
    deterministic filler standing in for the entropy-coded partitions —
    enough for any header-level parser, loud for any real decoder."""
    if not (0 < width <= 0x3FFF and 0 < height <= 0x3FFF):
        raise ValueError("VP8: dims out of 14-bit range")
    tag = (0) | (0 << 1) | (1 << 4) | (part_size << 5)
    return (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width, height)
        + filler
    )


def encode_vp8_interframe(part_size: int, filler: bytes = b"") -> bytes:
    tag = 1 | (1 << 4) | (part_size << 5)
    return bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF)) + filler


# ----------------------------------------------------------------------
# Writer (fixtures + roundtrip tests)
# ----------------------------------------------------------------------
def encode_mkv(
    tracks: list[dict],
    clusters: list[tuple[int, list[tuple[int, int, bool, bytes]]]],
    doc_type: str = "webm",
    timestamp_scale: int = 1_000_000,
    duration_ms: int | None = None,
    unknown_size_segment: bool = False,
    unknown_size_clusters: bool = False,
    block_groups: bool = False,
) -> bytes:
    """Serialize a Matroska/WebM file.

    ``tracks``: dicts with ``number``, ``uid``, ``type`` ('video'/
    'audio'), ``codec_id``, and video ``width``/``height`` or audio
    ``sample_hz``/``channels`` (+ optional ``codec_private``).
    ``clusters``: ``(cluster_ts, [(track_number, rel_ts, keyframe,
    payload), ...])``. ``block_groups`` writes non-key video frames as
    BlockGroup+ReferenceBlock instead of SimpleBlock (same census —
    exercises the group path). ``unknown_size_segment`` /
    ``unknown_size_clusters`` write the streaming-muxer forms (a live
    muxer cannot know sizes up front; the parser ends such a Cluster at
    the next segment-level element id)."""
    if not tracks:
        raise ValueError("encode_mkv: at least one track required")
    head = _el(
        _EBML,
        _el(0x4286, _uint(1))          # EBMLVersion
        + _el(0x42F7, _uint(1))        # EBMLReadVersion
        + _el(0x42F2, _uint(4))        # EBMLMaxIDLength
        + _el(0x42F3, _uint(8))        # EBMLMaxSizeLength
        + _el(_DOCTYPE, doc_type.encode())
        + _el(0x4287, _uint(4))        # DocTypeVersion
        + _el(0x4285, _uint(2)),       # DocTypeReadVersion
    )
    info = _el(_TS_SCALE, _uint(timestamp_scale))
    if duration_ms is not None:
        dur = duration_ms * 1_000_000.0 / timestamp_scale
        info += _el(_DURATION, struct.pack(">d", dur))
    seg = _el(_INFO, info)

    entries = b""
    for t in tracks:
        ttype = {"video": 1, "audio": 2, "subtitle": 17}.get(t["type"])
        if ttype is None:
            raise ValueError(f"encode_mkv: unknown track type {t['type']!r}")
        e = (
            _el(_TRACK_NUMBER, _uint(t["number"]))
            + _el(_TRACK_UID, _uint(t["uid"]))
            + _el(_TRACK_TYPE, _uint(ttype))
            + _el(_CODEC_ID, t["codec_id"].encode())
        )
        if t.get("codec_private"):
            e += _el(_CODEC_PRIVATE, t["codec_private"])
        if t["type"] == "video":
            e += _el(
                _VIDEO,
                _el(_PIXEL_W, _uint(t["width"]))
                + _el(_PIXEL_H, _uint(t["height"])),
            )
        elif t["type"] == "audio":
            e += _el(
                _AUDIO,
                _el(_SAMPLE_HZ, struct.pack(">d", float(t["sample_hz"])))
                + _el(_CHANNELS, _uint(t["channels"])),
            )
        entries += _el(_TRACK_ENTRY, e)
    seg += _el(_TRACKS, entries)

    for cts, blocks in clusters:
        if not blocks:
            raise ValueError("encode_mkv: empty cluster")
        body = _el(_CLUSTER_TS, _uint(cts))
        for blk_tuple in blocks:
            tn, rel, key, payload = blk_tuple[:4]
            duration = blk_tuple[4] if len(blk_tuple) == 5 else None
            hdr = _vint(tn) + struct.pack(">h", rel)
            if duration is not None:
                # timed cue: BlockGroup with BlockDuration (the
                # subtitle form — keyframe iff no ReferenceBlock)
                blk = _el(_BLOCK, hdr + b"\x00" + payload)
                grp = blk + _el(_BLOCK_DURATION, _uint(duration))
                if not key:
                    grp += _el(_REF_BLOCK, struct.pack(">h", -1))
                body += _el(_BLOCK_GROUP, grp)
            elif block_groups and not key:
                blk = _el(_BLOCK, hdr + b"\x00" + payload)
                body += _el(
                    _BLOCK_GROUP, blk + _el(_REF_BLOCK, struct.pack(">h", -1))
                )
            else:
                body += _el(
                    _SIMPLE_BLOCK, hdr + bytes((0x80 if key else 0x00,)) + payload
                )
        if unknown_size_clusters:
            # 1-byte all-ones VINT = unknown size; parser stops at the
            # next segment-level id (or EOF)
            seg += _id_bytes(_CLUSTER) + b"\xff" + body
        else:
            seg += _el(_CLUSTER, body)

    if unknown_size_segment:
        # 8-byte all-ones VINT = unknown size; Segment runs to EOF
        return head + _id_bytes(_SEGMENT) + b"\x01" + b"\xff" * 7 + seg
    return head + _el(_SEGMENT, seg)
