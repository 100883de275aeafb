"""AV1 sequence-header OBU + av1C record parsing (AOM public specs).

Completes the modern-codec metadata triple next to H.264 (``avcC``,
r9) and H.265 (``hvcC``, r9-continued): AV1 is the royalty-free codec
the large crawl-video platforms are migrating to, and its stream
parameters live in the sequence header OBU ("AV1 Bitstream & Decoding
Process Specification" §5.5) carried by the ``av1C``
AV1CodecConfigurationRecord ("AV1 Codec ISO Media File Format
Binding" §2.3) in MP4, and verbatim in Matroska ``CodecPrivate`` for
``V_AV1`` tracks.

Parsed, in bitstream order: profile, level + tier (from the first
operating point), max frame dims (variable-bit-width coded — a parser
that guesses widths desyncs immediately), the full color_config
(high_bitdepth/twelve_bit -> bit depth, monochrome, subsampling mode),
both the full and the reduced_still_picture header forms, and
timing_info when present. Out-of-scope constructs refuse loudly
(decoder_model_info — ValueError, callers quarantine) rather than
desync silently.

Encoders exist for fixtures/roundtrips and emit minimal-width dim
fields and canonical flag defaults (all optional tools off).
"""
from __future__ import annotations

from shared_etl_pipelines_spark.sources.mp4 import _BitReader, _BitWriter

__all__ = [
    "parse_av1_seq_header",
    "encode_av1_seq_header",
    "parse_av1c",
    "encode_av1c",
]


def _leb128_read(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(8):
        if pos + i >= len(data):
            raise ValueError("OBU leb128 truncated")
        b = data[pos + i]
        v |= (b & 0x7F) << (7 * i)
        if not (b & 0x80):
            return v, pos + i + 1
    raise ValueError("OBU leb128 over 8 bytes")


def _leb128(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def parse_av1_seq_header(obu: bytes) -> dict:
    """Parse a sequence-header OBU (header + payload). Returns profile/
    level/tier, max frame dims, bit depth, monochrome flag and the
    4:2:0/4:2:2/4:4:4 subsampling mode mapped onto the repo-wide
    chroma_format_idc convention (0=mono, 1=420, 2=422, 3=444)."""
    if not obu:
        raise ValueError("empty OBU")
    b0 = obu[0]
    if b0 & 0x80:
        raise ValueError("OBU forbidden bit set")
    obu_type = (b0 >> 3) & 0xF
    if obu_type != 1:
        raise ValueError(f"OBU type {obu_type} is not a sequence header")
    has_ext = (b0 >> 2) & 1
    has_size = (b0 >> 1) & 1
    pos = 1 + (1 if has_ext else 0)
    if has_size:
        size, pos = _leb128_read(obu, pos)
        payload = obu[pos : pos + size]
        if len(payload) < size:
            raise ValueError("OBU payload truncated")
    else:
        payload = obu[pos:]
    r = _BitReader(payload)

    profile = r.u(3)
    if profile > 2:
        raise ValueError(f"seq_profile {profile} reserved")
    still_picture = r.u(1)
    reduced = r.u(1)
    tier = 0
    if reduced:
        if not still_picture:
            raise ValueError("reduced_still_picture_header without still_picture")
        level = r.u(5)
    else:
        if r.u(1):  # timing_info_present_flag
            r.u(32)  # num_units_in_display_tick
            r.u(32)  # time_scale
            if r.u(1):  # equal_picture_interval
                r.ue()  # num_ticks_per_picture_minus_1 (uvlc)
            if r.u(1):  # decoder_model_info_present_flag
                raise ValueError("decoder_model_info unsupported — quarantine")
        initial_delay_present = r.u(1)
        op_cnt = r.u(5) + 1
        level = 0
        for i in range(op_cnt):
            r.u(12)  # operating_point_idc
            lvl = r.u(5)
            t = r.u(1) if lvl > 7 else 0
            if i == 0:
                level, tier = lvl, t
            if initial_delay_present and r.u(1):
                r.u(4)  # initial_display_delay_minus_1
    wbits = r.u(4) + 1
    hbits = r.u(4) + 1
    width = r.u(wbits) + 1
    height = r.u(hbits) + 1
    if not reduced:
        if r.u(1):  # frame_id_numbers_present_flag
            r.u(4)  # delta_frame_id_length_minus_2
            r.u(3)  # additional_frame_id_length_minus_1
    r.u(1)  # use_128x128_superblock
    r.u(1)  # enable_filter_intra
    r.u(1)  # enable_intra_edge_filter
    if not reduced:
        r.u(4)  # interintra/masked/warped/dual_filter
        enable_order_hint = r.u(1)
        if enable_order_hint:
            r.u(2)  # jnt_comp + ref_frame_mvs
        if not r.u(1):  # seq_choose_screen_content_tools
            force_sct = r.u(1)
        else:
            force_sct = 2  # SELECT_SCREEN_CONTENT_TOOLS
        if force_sct > 0:
            if not r.u(1):  # seq_choose_integer_mv
                r.u(1)  # seq_force_integer_mv
        if enable_order_hint:
            r.u(3)  # order_hint_bits_minus_1
    r.u(3)  # enable_superres / cdef / restoration
    # color_config()
    high = r.u(1)
    if profile == 2 and high:
        bit_depth = 12 if r.u(1) else 10
    else:
        bit_depth = 10 if high else 8
    mono = r.u(1) if profile != 1 else 0
    if r.u(1):  # color_description_present_flag
        cp, tc, mc = r.u(8), r.u(8), r.u(8)
    else:
        cp, tc, mc = 2, 2, 2  # unspecified
    if mono:
        r.u(1)  # color_range
        ss_x = ss_y = 1
    elif cp == 1 and tc == 13 and mc == 0:  # sRGB triple
        ss_x = ss_y = 0
    else:
        r.u(1)  # color_range
        if profile == 0:
            ss_x = ss_y = 1
        elif profile == 1:
            ss_x = ss_y = 0
        else:
            if bit_depth == 12:
                ss_x = r.u(1)
                ss_y = r.u(1) if ss_x else 0
            else:
                ss_x, ss_y = 1, 0
        if ss_x and ss_y:
            r.u(2)  # chroma_sample_position
    if not mono:
        r.u(1)  # separate_uv_delta_q
    r.u(1)  # film_grain_params_present
    chroma = (
        0 if mono
        else 1 if (ss_x, ss_y) == (1, 1)
        else 2 if (ss_x, ss_y) == (1, 0)
        else 3
    )
    return {
        "profile_idc": profile,
        "level_idc": level,
        "tier_flag": tier,
        "bit_depth": bit_depth,
        "mono_chrome": mono,
        "chroma_format_idc": chroma,
        "width": width,
        "height": height,
        "still_picture": still_picture,
        "reduced": reduced,
    }


def encode_av1_seq_header(
    width: int,
    height: int,
    profile: int = 0,
    level: int = 8,
    tier: int = 0,
    bit_depth: int = 8,
    mono: bool = False,
    reduced_still_picture: bool = False,
    timing_info: tuple[int, int, int] | None = None,
) -> bytes:
    """Sequence-header OBU (with size field) in the canonical
    all-optional-tools-off form. ``timing_info`` = (num_units,
    time_scale, ticks_minus_1) writes the equal-picture-interval
    timing block. Dim fields use minimal bit widths, so the variable-
    width decode path is always exercised."""
    if profile == 1 and mono:
        raise ValueError("profile 1 (4:4:4) cannot be monochrome")
    if bit_depth == 12 and profile != 2:
        raise ValueError("12-bit requires professional profile 2")
    if bit_depth == 10 and profile == 2:
        pass  # high_bitdepth + !twelve_bit
    w = _BitWriter()
    w.u(3, profile)
    w.u(1, 1 if reduced_still_picture else 0)  # still_picture
    w.u(1, 1 if reduced_still_picture else 0)  # reduced header form
    if reduced_still_picture:
        w.u(5, level)
    else:
        if timing_info is not None:
            w.u(1, 1)
            w.u(32, timing_info[0])
            w.u(32, timing_info[1])
            w.u(1, 1)  # equal_picture_interval
            w.ue(timing_info[2])
            w.u(1, 0)  # decoder_model_info_present_flag
        else:
            w.u(1, 0)
        w.u(1, 0)  # initial_display_delay_present_flag
        w.u(5, 0)  # operating_points_cnt_minus_1
        w.u(12, 0)  # operating_point_idc[0]
        w.u(5, level)
        if level > 7:
            w.u(1, tier)
    wbits = max((width - 1).bit_length(), 1)
    hbits = max((height - 1).bit_length(), 1)
    w.u(4, wbits - 1)
    w.u(4, hbits - 1)
    w.u(wbits, width - 1)
    w.u(hbits, height - 1)
    if not reduced_still_picture:
        w.u(1, 0)  # frame_id_numbers_present_flag
    w.u(1, 0)  # use_128x128_superblock
    w.u(1, 0)  # enable_filter_intra
    w.u(1, 0)  # enable_intra_edge_filter
    if not reduced_still_picture:
        w.u(4, 0)  # interintra/masked/warped/dual_filter
        w.u(1, 0)  # enable_order_hint
        w.u(1, 1)  # seq_choose_screen_content_tools -> SELECT
        w.u(1, 1)  # seq_choose_integer_mv -> SELECT (force_sct==2 > 0)
    w.u(3, 0)  # enable_superres / cdef / restoration
    # color_config
    high = 1 if bit_depth > 8 else 0
    w.u(1, high)
    if profile == 2 and high:
        w.u(1, 1 if bit_depth == 12 else 0)
    w_mono = 1 if mono else 0
    if profile != 1:
        w.u(1, w_mono)
    w.u(1, 0)  # color_description_present_flag
    w.u(1, 0)  # color_range
    ss_x, ss_y = (1, 1) if mono else (
        (1, 1) if profile == 0 else (0, 0) if profile == 1 else (1, 0)
    )
    if not mono and profile == 2 and bit_depth == 12:
        w.u(1, ss_x)
        if ss_x:
            w.u(1, ss_y)
    if not mono and ss_x and ss_y:
        w.u(2, 0)  # chroma_sample_position
    if not mono:
        w.u(1, 0)  # separate_uv_delta_q
    w.u(1, 0)  # film_grain_params_present
    # byte-align WITHOUT the H.264 rbsp stop bit (OBUs use trailing
    # bits only for size-less payloads; spec trailing = 1 + zeros)
    bits = w.bits + [1]
    while len(bits) % 8:
        bits.append(0)
    payload = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i : i + 8]:
            b = (b << 1) | bit
        payload.append(b)
    header = bytes([(1 << 3) | (1 << 1)])  # type=1, has_size=1
    return header + _leb128(len(payload)) + bytes(payload)


def encode_av1c(seq_obu: bytes, info: dict) -> bytes:
    """AV1CodecConfigurationRecord wrapping a sequence-header OBU."""
    high = 1 if info["bit_depth"] > 8 else 0
    twelve = 1 if info["bit_depth"] == 12 else 0
    mono = 1 if info["mono_chrome"] else 0
    chroma = info["chroma_format_idc"]
    ss_x, ss_y = (1, 1) if mono else {1: (1, 1), 2: (1, 0), 3: (0, 0)}[chroma]
    rec = bytearray([0x81])  # marker + version 1
    rec.append((info["profile_idc"] << 5) | info["level_idc"])
    rec.append(
        (info["tier_flag"] << 7) | (high << 6) | (twelve << 5)
        | (mono << 4) | (ss_x << 3) | (ss_y << 2)
    )
    rec.append(0)
    return bytes(rec) + seq_obu


def parse_av1c(rec: bytes) -> dict:
    """av1C record -> AV1 stream parameters: the embedded sequence
    header is authoritative; the record summary bytes are cross-checked
    against it and a mismatch refuses loudly (re-mux defect), the hvcC
    contract."""
    if len(rec) < 5:
        raise ValueError("av1C record truncated")
    if rec[0] != 0x81:
        raise ValueError(f"av1C marker/version byte {rec[0]:#x} != 0x81")
    rec_profile = rec[1] >> 5
    rec_level = rec[1] & 0x1F
    rec_tier = rec[2] >> 7
    rec_high = (rec[2] >> 6) & 1
    rec_twelve = (rec[2] >> 5) & 1
    rec_mono = (rec[2] >> 4) & 1
    out = parse_av1_seq_header(rec[4:])
    high = 1 if out["bit_depth"] > 8 else 0
    twelve = 1 if out["bit_depth"] == 12 else 0
    if (
        rec_profile != out["profile_idc"]
        or rec_level != out["level_idc"]
        or rec_tier != out["tier_flag"]
        or rec_high != high
        or rec_twelve != twelve
        or rec_mono != out["mono_chrome"]
    ):
        raise ValueError("av1C/sequence-header parameter mismatch")
    return out
