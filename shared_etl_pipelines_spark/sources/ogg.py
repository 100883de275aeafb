"""Pure-python OGG container walk (RFC 3533) with Vorbis header
parsing — page/packet census, granule-position duration, comment
metadata, loud payload quarantine.

OGG is the remaining common crawl-audio container after the repo's
MP3/FLAC/WAV coverage (VERDICT r8 item 7). The page grammar is the
public RFC 3533 spec: 27-byte headers with a capture pattern, a
dedicated CRC-32 (polynomial 0x04C11DB7, zero init, no reflection, no
final xor — NOT the zlib CRC), a segment lacing table that frames
packets across pages, and BOS/EOS/continued flags. The Vorbis
identification and comment headers (Xiph Vorbis I spec §4.2) are tiny
little-endian structures carried in the first packets.

Scope — the same discipline as sources/mp4.py: parse EVERYTHING at the
container level (every page checked against its CRC, every packet
reassembled through the lacing chain, spanning packets included) and
refuse what we do not own. Vorbis AUDIO decode (MDCT synthesis) is out
of scope: audio packets are censused (count, bytes), never decoded.
Malformed input — bad capture pattern, CRC mismatch, sequence gaps,
orphan continuations, truncated packets, missing EOS, malformed
comment lengths — raises ValueError with a named reason; callers
quarantine, never guess.
"""

from __future__ import annotations

import struct

__all__ = [
    "is_ogg",
    "parse_ogg",
    "encode_ogg_vorbis",
    "encode_ogg_opus",
    "ogg_crc",
]


def _crc_table() -> list[int]:
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC_TABLE = _crc_table()


def ogg_crc(data: bytes) -> int:
    """The OGG page CRC: 0x04C11DB7, zero init, MSB-first, no final
    xor (RFC 3533 §6) — deliberately not zlib.crc32."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ b]
    return r


def is_ogg(data: bytes) -> bool:
    return len(data) >= 27 and data[:4] == b"OggS"


def _encode_page(
    serial: int,
    seq: int,
    granule: int,
    htype: int,
    segments: list[bytes],
) -> bytes:
    """One page from pre-laced segment chunks (each <= 255 bytes; a
    chunk of exactly 255 continues its packet, < 255 terminates it)."""
    lacing = bytes(len(s) for s in segments)
    payload = b"".join(segments)
    head = (
        b"OggS"
        + struct.pack(
            "<BBqIII",
            0,
            htype,
            granule,
            serial,
            seq,
            0,  # crc placeholder
        )
        + bytes([len(segments)])
        + lacing
    )
    page = bytearray(head + payload)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _lace(packet: bytes) -> list[bytes]:
    """Split a packet into lacing chunks: 255-byte chunks plus a final
    chunk < 255 (possibly empty — the spec's zero lacing value)."""
    out = []
    i = 0
    while len(packet) - i >= 255:
        out.append(packet[i : i + 255])
        i += 255
    out.append(packet[i:])
    return out


def encode_ogg_vorbis(
    channels: int,
    sample_rate: int,
    vendor: str,
    comments: list[str],
    audio_packets: list[bytes],
    total_granule: int,
    split_first_audio: bool = False,
    serial: int = 0x5047,
) -> bytes:
    """A real multi-page OGG/Vorbis stream: ident header alone on the
    BOS page, comment + setup headers on page 1, one audio packet per
    page (lacing chains for >=255-byte packets), EOS + the stream's
    total granule position on the final page.

    ``split_first_audio`` spans the first audio packet (must be > 255
    bytes) across a page boundary: its first 255 bytes end page 2 with
    a 255 lacing value (granule -1 — no packet ends there, RFC 3533
    §6), the rest opens page 3 with the continued flag."""
    if not audio_packets:
        raise ValueError("at least one audio packet required (EOS page)")
    ident = (
        b"\x01vorbis"
        + struct.pack("<IBI", 0, channels, sample_rate)
        + struct.pack("<iii", 0, 112000, 0)
        + bytes([0xB8])  # blocksizes 2^8 / 2^11
        + b"\x01"
    )
    comm = b"\x03vorbis" + struct.pack("<I", len(vendor)) + vendor.encode()
    comm += struct.pack("<I", len(comments))
    for c in comments:
        cb = c.encode()
        comm += struct.pack("<I", len(cb)) + cb
    comm += b"\x01"
    setup = b"\x05vorbis" + b"\x00" * 8  # opaque stand-in codebooks

    pages = [_encode_page(serial, 0, 0, 0x02, _lace(ident))]
    pages.append(_encode_page(serial, 1, 0, 0, _lace(comm) + _lace(setup)))
    seq = 2
    granule_step = max(total_granule // max(len(audio_packets), 1), 1)
    gran = 0
    for i, pkt in enumerate(audio_packets):
        last = i == len(audio_packets) - 1
        gran = total_granule if last else gran + granule_step
        if i == 0 and split_first_audio:
            if len(pkt) <= 255:
                raise ValueError("split_first_audio needs a >255-byte packet")
            pages.append(
                _encode_page(serial, seq, -1, 0, [pkt[:255]])
            )
            seq += 1
            pages.append(
                _encode_page(
                    serial, seq, gran, 0x01 | (0x04 if last else 0),
                    _lace(pkt[255:]),
                )
            )
            seq += 1
            continue
        pages.append(
            _encode_page(
                serial, seq, gran, 0x04 if last else 0, _lace(pkt)
            )
        )
        seq += 1
    return b"".join(pages)


def encode_ogg_opus(
    channels: int,
    input_sample_rate: int,
    pre_skip: int,
    vendor: str,
    comments: list[str],
    audio_packets: list[bytes],
    total_granule: int,
    serial: int = 0x504F,
) -> bytes:
    """A real multi-page OGG/Opus stream (RFC 7845): OpusHead alone on
    the BOS page, OpusTags on page 1, one audio packet per page, EOS +
    the 48 kHz total granule on the final page. The audio packets are
    opaque (Opus SILK/CELT decode is out of scope — census only)."""
    if not audio_packets:
        raise ValueError("at least one audio packet required (EOS page)")
    head = (
        b"OpusHead"
        + struct.pack("<BBHIhB", 1, channels, pre_skip, input_sample_rate, 0, 0)
    )
    tags = b"OpusTags" + struct.pack("<I", len(vendor)) + vendor.encode()
    tags += struct.pack("<I", len(comments))
    for c in comments:
        cb = c.encode()
        tags += struct.pack("<I", len(cb)) + cb

    pages = [_encode_page(serial, 0, 0, 0x02, _lace(head))]
    pages.append(_encode_page(serial, 1, 0, 0, _lace(tags)))
    seq = 2
    granule_step = max(total_granule // max(len(audio_packets), 1), 1)
    gran = 0
    for i, pkt in enumerate(audio_packets):
        last = i == len(audio_packets) - 1
        gran = total_granule if last else gran + granule_step
        pages.append(
            _encode_page(serial, seq, gran, 0x04 if last else 0, _lace(pkt))
        )
        seq += 1
    return b"".join(pages)


def parse_ogg(data: bytes) -> dict:
    """Strict page walk -> packet reassembly -> codec header decode
    (Vorbis ident/comment headers, or OpusHead/OpusTags per RFC 7845 —
    dispatched on the first packet's magic).

    Returns {codec, n_pages, n_packets, serial, channels, sample_rate,
    duration_ms, vendor, comments, audio_bytes, n_audio_packets,
    pre_skip}. For Opus, sample_rate is the informational input rate
    from OpusHead and duration is computed on the 48 kHz granule clock
    minus pre-skip, per spec. Raises ValueError with a named reason on
    any malformation — CRC mismatch, version, sequence gap, orphan
    continuation, truncated page or packet, missing EOS, malformed
    codec headers."""
    if not is_ogg(data):
        raise ValueError("not an OGG stream (no OggS capture pattern)")
    pos = 0
    n_pages = 0
    serial0: int | None = None
    expect_seq = 0
    packets: list[bytes] = []
    partial = b""
    last_granule = 0
    saw_eos = False
    while pos < len(data):
        if saw_eos:
            raise ValueError("page after the EOS page")
        if data[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost page sync at offset {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated page header")
        version, htype, granule, serial, seq, crc = struct.unpack_from(
            "<BBqIII", data, pos + 4
        )
        if version != 0:
            raise ValueError(f"unsupported OGG version {version}")
        nsegs = data[pos + 26]
        table_end = pos + 27 + nsegs
        if table_end > len(data):
            raise ValueError("truncated segment table")
        lacing = data[pos + 27 : table_end]
        body_len = sum(lacing)
        page_end = table_end + body_len
        if page_end > len(data):
            raise ValueError("truncated page payload")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"page CRC mismatch at page {n_pages}")
        if serial0 is None:
            serial0 = serial
            if not htype & 0x02:
                raise ValueError("first page is not BOS")
        elif serial != serial0:
            raise ValueError("multiplexed streams not supported")
        if seq != expect_seq:
            raise ValueError(
                f"page sequence gap: expected {expect_seq}, got {seq}"
            )
        expect_seq += 1
        if htype & 0x01:
            if not partial:
                raise ValueError("continued flag with no partial packet")
        elif partial:
            raise ValueError("packet left open across a page boundary")
        body = data[table_end:page_end]
        off = 0
        for lv in lacing:
            partial += body[off : off + lv]
            off += lv
            if lv < 255:
                packets.append(partial)
                partial = b""
        if htype & 0x04:
            saw_eos = True
        if granule >= 0:
            last_granule = granule
        pos = page_end
        n_pages += 1
    if partial:
        raise ValueError("stream ends inside a packet")
    if not saw_eos:
        raise ValueError("no EOS page")
    if len(packets) < 2:
        raise ValueError("fewer packets than any codec's header count")

    ident = packets[0]
    if ident[:8] == b"OpusHead":
        return _finish_opus(packets, n_pages, serial0, last_granule)
    if ident[:7] != b"\x01vorbis" or len(ident) < 30:
        raise ValueError(
            "first packet is neither a Vorbis identification header "
            "nor an OpusHead"
        )
    if len(packets) < 3:
        raise ValueError("fewer than the three Vorbis header packets")
    vversion, channels, rate = struct.unpack_from("<IBI", ident, 7)
    if vversion != 0:
        raise ValueError(f"unsupported Vorbis version {vversion}")
    if channels < 1 or rate < 1:
        raise ValueError("Vorbis ident header with zero channels/rate")

    comm = packets[1]
    if comm[:7] != b"\x03vorbis":
        raise ValueError("second packet is not a Vorbis comment header")
    vendor, comments = _parse_comment_block(comm, 7)
    if packets[2][:7] != b"\x05vorbis":
        raise ValueError("third packet is not a Vorbis setup header")

    audio = packets[3:]
    return {
        "codec": "vorbis",
        "n_pages": n_pages,
        "n_packets": len(packets),
        "serial": serial0,
        "channels": channels,
        "sample_rate": rate,
        "duration_ms": last_granule * 1000 // rate,
        "vendor": vendor,
        "comments": comments,
        "audio_bytes": sum(len(a) for a in audio),
        "n_audio_packets": len(audio),
        "pre_skip": 0,
    }


def _parse_comment_block(comm: bytes, off: int) -> tuple[str, list[str]]:
    """The shared Vorbis-comment layout (also used verbatim by
    OpusTags, RFC 7845 §5.2): u32-LE vendor length + vendor, u32-LE
    comment count, then (u32-LE length + bytes) per comment. Overruns
    raise — callers quarantine."""
    p = off
    if p + 4 > len(comm):
        raise ValueError("comment vendor length overruns the packet")
    (vlen,) = struct.unpack_from("<I", comm, p)
    p += 4
    if p + vlen > len(comm):
        raise ValueError("comment vendor string overruns the packet")
    vendor = comm[p : p + vlen].decode("utf-8", "strict")
    p += vlen
    if p + 4 > len(comm):
        raise ValueError("comment count overruns the packet")
    (ncomm,) = struct.unpack_from("<I", comm, p)
    p += 4
    comments = []
    for _ in range(ncomm):
        if p + 4 > len(comm):
            raise ValueError("comment length field overruns the packet")
        (clen,) = struct.unpack_from("<I", comm, p)
        p += 4
        if p + clen > len(comm):
            raise ValueError("comment string overruns the packet")
        comments.append(comm[p : p + clen].decode("utf-8", "strict"))
        p += clen
    return vendor, comments


def _finish_opus(
    packets: list[bytes], n_pages: int, serial0: int, last_granule: int
) -> dict:
    """OpusHead/OpusTags decode (RFC 7845 §5): version 1, channel
    count, pre-skip, informational input rate; duration runs on the
    48 kHz granule clock minus pre-skip regardless of input rate."""
    head = packets[0]
    if len(head) < 19:
        raise ValueError("OpusHead truncated")
    version, channels, pre_skip, in_rate, _gain, mapping = struct.unpack_from(
        "<BBHIhB", head, 8
    )
    if version != 1:
        raise ValueError(f"unsupported OpusHead version {version}")
    if channels < 1:
        raise ValueError("OpusHead with zero channels")
    if mapping != 0:
        raise ValueError(
            f"Opus channel mapping family {mapping} not supported"
        )
    tags = packets[1]
    if tags[:8] != b"OpusTags":
        raise ValueError("second packet is not OpusTags")
    vendor, comments = _parse_comment_block(tags, 8)
    audio = packets[2:]
    samples = max(last_granule - pre_skip, 0)
    return {
        "codec": "opus",
        "n_pages": n_pages,
        "n_packets": len(packets),
        "serial": serial0,
        "channels": channels,
        "sample_rate": in_rate,
        "duration_ms": samples * 1000 // 48000,
        "vendor": vendor,
        "comments": comments,
        "audio_bytes": sum(len(a) for a in audio),
        "n_audio_packets": len(audio),
        "pre_skip": pre_skip,
    }
