"""MP3 (MPEG audio) frame-header scan — sync walk, header census,
ID3v2 skip, loud truncation/garbage quarantine.

MP3 is the dominant crawled audio format; full Layer III SYNTHESIS
(Huffman + IMDCT + polyphase filterbank) is legitimately out of scope
— declared, like H.264 — but the FRAME-HEADER walk is pure structure
and gives a crawl pipeline everything it thresholds on: duration,
bitrate, sample rate, channel mode, frame census, integrity. This is
the "at minimum an MP3 frame-header scan" half of VERDICT r7 item 6
(the FLAC codec in sources/flac.py is the full-decode half).

Public format (ISO/IEC 11172-3):

- optional ID3v2 prefix: ``ID3`` + version(2) + flags(1) + 28-bit
  syncsafe size -> skipped, reported
- per frame: 11-bit sync, version (MPEG1/2/2.5), layer (I/II/III),
  CRC flag, bitrate index (per version/layer table), sample-rate
  index, padding, channel mode
- Layer III frame length = (144 or 72) * bitrate / sample_rate
  + padding; samples/frame 1152 (MPEG1) or 576 (MPEG2/2.5)

The scan walks frame to frame by computed length. A stream that ends
mid-frame reports ``truncated``; bytes that never sync report
``is_mp3 = False``. Free-format (bitrate index 0) and bad indices
(15) raise — quarantine, not guesses.
"""

from __future__ import annotations

__all__ = ["is_mp3", "scan_mp3", "parse_id3v2", "encode_id3v2"]

# MPEG1 Layer III bitrates, kbps, index 1..14 (0 = free-format, 15 bad)
_BITRATES_V1_L3 = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
# MPEG2/2.5 Layer III
_BITRATES_V2_L3 = [
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_RATES = {
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],  # MPEG2.5
}


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none). The footer
    flag (0x10) adds the 10-byte ID3v2.4 footer the syncsafe size does
    not cover (review r8 #3)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size byte with high bit set")
        size = (size << 7) | b
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


# ID3v2 text-frame decode (r9): the metadata census half of the MP3
# story — crawl-audio audits threshold on title/artist/album presence
# and consistency, which the structural scan alone cannot see. Public
# spec (id3.org ID3v2.3 / ID3v2.4): 10-byte tag header, then frames of
# 4-char id + 4-byte size (PLAIN 32-bit in v2.3, 28-bit SYNCSAFE in
# v2.4) + 2 flag bytes; text frames ('T...') carry an encoding byte
# (0 latin-1, 1 utf-16 with BOM, 2 utf-16be, 3 utf-8) + the string.

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def parse_id3v2(data: bytes) -> dict:
    """Decode a leading ID3v2.3/2.4 tag to its text frames.

    Returns {version, n_frames, frames: {id: text}} (only 'T...' text
    frames are decoded; others are counted and skipped). Raises
    ValueError on structural damage — truncated headers, frame sizes
    overrunning the tag, unsynchronisation (not produced by any
    mainstream tagger for years and not worth a silent mis-parse),
    reserved text encodings — so callers quarantine, never guess."""
    if data[:3] != b"ID3" or len(data) < 10:
        raise ValueError("no ID3v2 tag")
    major = data[3]
    if major not in (3, 4):
        raise ValueError(f"ID3v2.{major} not supported — quarantine")
    flags = data[5]
    if flags & 0x80:
        raise ValueError("ID3v2 unsynchronisation flag — quarantine")
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size byte with high bit set")
        size = (size << 7) | b
    end = 10 + size
    if end > len(data):
        raise ValueError("ID3v2 tag size overruns the blob")
    p = 10
    if flags & 0x40:  # extended header: skip by its own size field
        if p + 4 > end:
            raise ValueError("ID3v2 extended header truncated")
        if major == 4:
            # v2.4: syncsafe size INCLUDING the size field itself
            ehs = 0
            for b in data[p : p + 4]:
                if b & 0x80:
                    raise ValueError("extended-header size byte high bit")
                ehs = (ehs << 7) | b
            p += ehs
        else:
            # v2.3: plain size EXCLUDING the 4 size bytes
            p += 4 + int.from_bytes(data[p : p + 4], "big")
        if p > end:
            raise ValueError("ID3v2 extended header overruns the tag")
    frames: dict[str, str] = {}
    n_frames = 0
    while p + 10 <= end:
        fid = data[p : p + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"malformed ID3v2 frame id {fid!r}")
        if major == 4:
            fsz = 0
            for b in data[p + 4 : p + 8]:
                if b & 0x80:
                    raise ValueError("v2.4 frame size byte with high bit set")
                fsz = (fsz << 7) | b
        else:
            fsz = int.from_bytes(data[p + 4 : p + 8], "big")
        body = p + 10
        if body + fsz > end:
            raise ValueError(
                f"frame {fid.decode('latin-1')} size overruns the tag"
            )
        n_frames += 1
        if fid[:1] == b"T" and fsz >= 1:
            enc = data[body]
            if enc not in _ID3_ENCODINGS:
                raise ValueError(f"reserved ID3v2 text encoding {enc}")
            raw = data[body + 1 : body + fsz]
            text = raw.decode(_ID3_ENCODINGS[enc], "strict")
            frames[fid.decode("latin-1")] = text.rstrip("\x00")
        p = body + fsz
    return {"version": major, "n_frames": n_frames, "frames": frames}


def encode_id3v2(frames: dict[str, str], major: int = 4, encoding: int = 3) -> bytes:
    """A real ID3v2.3/2.4 tag from text frames, for fixtures: frame
    sizes syncsafe in v2.4 and plain 32-bit in v2.3, the two layouts a
    parser must distinguish."""
    body = b""
    for fid, text in sorted(frames.items()):
        enc_name = _ID3_ENCODINGS[encoding]
        raw = bytes([encoding]) + text.encode(enc_name)
        if major == 4:
            sz = bytes(
                [(len(raw) >> 21) & 0x7F, (len(raw) >> 14) & 0x7F,
                 (len(raw) >> 7) & 0x7F, len(raw) & 0x7F]
            )
        else:
            sz = len(raw).to_bytes(4, "big")
        body += fid.encode("latin-1") + sz + b"\x00\x00" + raw
    total = len(body)
    head = b"ID3" + bytes([major, 0, 0]) + bytes(
        [(total >> 21) & 0x7F, (total >> 14) & 0x7F,
         (total >> 7) & 0x7F, total & 0x7F]
    )
    return head + body


def is_mp3(data: bytes) -> bool:
    """Starts with an ID3v2 tag or a valid Layer III frame sync."""
    try:
        off = _id3v2_size(data)
    except ValueError:
        return False
    if off + 4 > len(data):
        return False
    b0, b1 = data[off], data[off + 1]
    return b0 == 0xFF and (b1 & 0xE0) == 0xE0 and ((b1 >> 1) & 0x03) == 0x01


def scan_mp3(data: bytes) -> dict:
    """Walk every frame; return the census a curation pipeline needs.

    Returns: version ('MPEG1'|'MPEG2'|'MPEG2.5'), sample_rate,
    channel_mode ('stereo'|'joint'|'dual'|'mono'), n_frames,
    bitrate_kbps_min/max (VBR visible), duration_ms, id3_bytes,
    truncated (stream ended mid-frame). Raises ValueError on
    non-MP3 bytes, free-format/bad bitrate indices, layer/version
    changes mid-stream, or lost sync — the quarantine signals."""
    id3 = _id3v2_size(data)
    pos = id3
    if pos + 4 > len(data):
        raise ValueError("no room for an MPEG frame header")
    version = sample_rate = None
    mode = None
    n_frames = 0
    samples = 0
    br_min = br_max = None
    truncated = False
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if not (b0 == 0xFF and (b1 & 0xE0) == 0xE0):
            # trailing metadata, not lost sync: the ubiquitous 128-byte
            # ID3v1 'TAG' trailer and appended ID3v2 chunks end the
            # frame walk cleanly (review r8 #3 — real crawled MP3s
            # carry these; rejecting them quarantined valid files)
            if data[pos : pos + 3] in (b"TAG", b"ID3"):
                pos = len(data)
                break
            raise ValueError(f"lost MPEG sync at byte {pos}")
        ver_bits = (b1 >> 3) & 0x03
        if ver_bits == 1:
            raise ValueError("reserved MPEG version bits")
        layer_bits = (b1 >> 1) & 0x03
        if layer_bits != 0x01:
            raise ValueError("only Layer III streams are scanned — quarantine")
        bi = (b2 >> 4) & 0x0F
        if bi == 0:
            raise ValueError("free-format bitrate unsupported — quarantine")
        if bi == 15:
            raise ValueError("invalid bitrate index 1111")
        sri = (b2 >> 2) & 0x03
        if sri == 3:
            raise ValueError("invalid sample-rate index 11")
        padding = (b2 >> 1) & 0x01
        mode_bits = (b3 >> 6) & 0x03
        v1 = ver_bits == 3
        rate = _RATES[ver_bits][sri]
        kbps = (_BITRATES_V1_L3 if v1 else _BITRATES_V2_L3)[bi]
        vname = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[ver_bits]
        if version is None:
            version, sample_rate = vname, rate
            mode = ["stereo", "joint", "dual", "mono"][mode_bits]
        elif (vname, rate) != (version, sample_rate):
            raise ValueError("version/sample-rate change mid-stream")
        flen = (144000 if v1 else 72000) * kbps // rate + padding
        if pos + flen > len(data):
            truncated = True
            break
        n_frames += 1
        samples += 1152 if v1 else 576
        br_min = kbps if br_min is None else min(br_min, kbps)
        br_max = kbps if br_max is None else max(br_max, kbps)
        pos += flen
    if 0 < len(data) - pos < 4:
        # 1-3 leftover bytes: a frame header cut mid-way is the same
        # physical truncation as a cut payload — flag it (review r8 #6)
        truncated = True
    if n_frames == 0:
        raise ValueError("no complete MPEG frame — quarantine")
    return {
        "version": version,
        "sample_rate": sample_rate,
        "channel_mode": mode,
        "n_frames": n_frames,
        "bitrate_kbps_min": br_min,
        "bitrate_kbps_max": br_max,
        "duration_ms": samples * 1000 // sample_rate,
        "id3_bytes": id3,
        "truncated": truncated,
    }


def encode_mp3_frames(
    n_frames: int,
    bitrate_index: int = 9,
    sample_rate_index: int = 0,
    mono: bool = False,
    id3_size: int = 0,
    fill: int = 0xAA,
) -> bytes:
    """Fixture-grade MPEG1 Layer III frame stream: valid headers with
    deterministic filler payloads (no real audio — the scan never
    reads payload bytes). ``id3_size`` > 0 prepends an ID3v2 tag of
    that payload size."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        out += bytes((i * 7) % 256 for i in range(id3_size))
    kbps = _BITRATES_V1_L3[bitrate_index]
    rate = _RATES[3][sample_rate_index]
    flen = 144000 * kbps // rate
    for i in range(n_frames):
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1, Layer III, no CRC
        b2 = (bitrate_index << 4) | (sample_rate_index << 2)
        b3 = (3 << 6) if mono else 0
        out += bytes([0xFF, b1, b2, b3])
        out += bytes(((i * 31 + j + fill) % 256) | 0 for j in range(flen - 4))
    return bytes(out)
