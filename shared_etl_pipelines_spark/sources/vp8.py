"""VP8 intra-frame (keyframe) pixel decode — RFC 6386, the PUBLIC
bitstream spec behind WebM video.

What is spec-true here (ported from the RFC's normative pseudocode):

- the boolean arithmetic coder, BOTH directions (§7.2/§7.3 verbatim,
  including carry propagation and the 4-byte flush);
- the uncompressed frame tag / 0x9d012a start code / 14-bit coded
  dimensions (§9.1);
- the full first-partition header walk: color space + clamping,
  segmentation block, loop-filter fields, DCT partition count,
  quantizer indices with all five deltas, refresh-entropy flag, the
  1056-slot coefficient-probability update section, and the
  mb_no_coeff_skip / prob_skip_false pair (§9.2-§9.11);
- keyframe macroblock records: per-MB skip flag, intra Y mode via the
  kf_ymode tree, chroma mode via the uv_mode tree (§11.2);
- intra prediction and reconstruction for DC/V/H/TM 16x16 luma and 8x8
  chroma, with the spec's 127/129 edge conventions and the
  only-available-neighbors DC average (§12.2-§12.3).

DOCUMENTED BOUNDARIES (the honest line; this container carries no copy
of RFC 6386's bulk probability tables and fabricating ~2,300 numeric
constants from memory would be worse than refusing):

- ``COEFF_UPDATE_STUB_PROB`` stands in for the spec's 1056-entry
  ``coeff_update_probs`` table when reading/writing the (always-zero
  in fixtures) update flags. Streams produced by this module's encoder
  decode exactly; a FOREIGN stream relying on the real table values
  may desync in the entropy header and will quarantine, not decode
  wrong silently.
- Non-skipped macroblocks (residual coefficients present) REFUSE with
  ValueError: token decoding needs the untranscribed
  ``default_coeff_probs`` table. The encoder therefore only emits
  skip-MB keyframes — real, fully entropy-coded frames whose pixels
  come entirely from intra prediction (exactly reconstructable, which
  is what the oracle contract needs).
- B_PRED (per-subblock intra) refuses for the same reason.

Reference parity note: sources/mkv.py:424 parses only the frame tag;
this module is the pixel path bridged into sample_video_frames the
same way the JPEG decoder was for MJPEG (VERDICT r10 task #5).
"""

from __future__ import annotations

__all__ = [
    "BoolDecoder",
    "BoolEncoder",
    "decode_keyframe",
    "encode_keyframe_skip",
    "COEFF_UPDATE_STUB_PROB",
]

COEFF_UPDATE_STUB_PROB = 252

# intra mode enum (RFC 6386 §11.2)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
MODE_NAMES = {DC_PRED: "DC", V_PRED: "V", H_PRED: "H", TM_PRED: "TM"}

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)


# ----------------------------------------------------------------------
# boolean coder (RFC 6386 §7) — exact ports of the normative C
# ----------------------------------------------------------------------
class BoolDecoder:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 2
        self.value = ((buf[0] << 8) | buf[1]) if len(buf) >= 2 else (
            (buf[0] << 8) if buf else 0
        )
        self.range = 255
        self.bit_count = 0

    def _byte(self) -> int:
        b = self.buf[self.pos] if self.pos < len(self.buf) else 0
        self.pos += 1
        return b

    def get(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._byte()
        return ret

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, bits: int) -> int:
        v = self.literal(bits)
        return -v if self.get(128) else v

    def tree(self, tree: tuple, probs: tuple) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i < 0:
            raise ValueError("vp8: carry out of the leading byte")
        self.out[i] += 1

    def put(self, prob: int, val: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if val:
            self.bottom += split
            if self.bottom >> 32:  # uint32 wrap in the C original
                self._carry()
                self.bottom &= 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, bits: int, v: int) -> None:
        for b in range(bits - 1, -1, -1):
            self.put(128, (v >> b) & 1)

    def signed(self, bits: int, v: int) -> None:
        self.literal(bits, abs(v))
        self.put(128, 1 if v < 0 else 0)

    def tree(self, tree: tuple, probs: tuple, symbol: int) -> None:
        path = _tree_path(tree, symbol)
        for node, bit in path:
            self.put(probs[node >> 1], bit)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        for _ in range(c >> 3):
            v = (v << 8) & 0xFFFFFFFF
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _tree_path(tree: tuple, symbol: int) -> list[tuple[int, int]]:
    def walk(i: int, path: list) -> list | None:
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == symbol:
                    return path + [(i, b)]
            else:
                r = walk(t, path + [(i, b)])
                if r is not None:
                    return r
        return None

    p = walk(0, [])
    if p is None:
        raise ValueError(f"vp8: symbol {symbol} not in tree")
    return p


# ----------------------------------------------------------------------
# frame header (first partition) — shared walk for encode/decode
# ----------------------------------------------------------------------
def _decode_seg_filter_quant(d: BoolDecoder, h: dict) -> None:
    """Segmentation block through the quantizer block — identical for
    key and inter frames (§9.3-§9.6)."""
    h["segmentation_enabled"] = d.literal(1)
    if h["segmentation_enabled"]:
        update_map = d.literal(1)
        update_data = d.literal(1)
        if update_data:
            d.literal(1)  # abs vs delta
            for _ in range(4):  # quantizer per segment
                if d.literal(1):
                    d.signed(7)
            for _ in range(4):  # filter level per segment
                if d.literal(1):
                    d.signed(6)
        if update_map:
            for _ in range(3):
                if d.literal(1):
                    d.literal(8)
    h["filter_type"] = d.literal(1)
    h["filter_level"] = d.literal(6)
    h["sharpness"] = d.literal(3)
    h["lf_delta_enabled"] = d.literal(1)
    if h["lf_delta_enabled"]:
        if d.literal(1):  # delta update
            for _ in range(8):  # 4 ref + 4 mode deltas
                if d.literal(1):
                    d.signed(6)
    h["log2_partitions"] = d.literal(2)
    h["y_ac_qi"] = d.literal(7)
    for key in ("y_dc_dq", "y2_dc_dq", "y2_ac_dq", "uv_dc_dq", "uv_ac_dq"):
        h[key] = d.signed(4) if d.literal(1) else 0


def _decode_coeff_updates_and_skip(d: BoolDecoder, h: dict) -> None:
    updates = 0
    for _ in range(4 * 8 * 3 * 11):  # coefficient-probability updates
        if d.get(COEFF_UPDATE_STUB_PROB):
            d.literal(8)
            updates += 1
    h["n_coeff_updates"] = updates
    h["mb_no_coeff_skip"] = d.literal(1)
    h["prob_skip_false"] = d.literal(8) if h["mb_no_coeff_skip"] else None


def _decode_header(d: BoolDecoder) -> dict:
    h = {"color_space": d.literal(1), "clamping": d.literal(1)}
    _decode_seg_filter_quant(d, h)
    h["refresh_entropy"] = d.literal(1)
    _decode_coeff_updates_and_skip(d, h)
    return h


def _encode_seg_filter_quant(e: BoolEncoder) -> None:
    e.literal(1, 0)  # segmentation off
    e.literal(1, 0)  # filter type
    e.literal(6, 0)  # filter level 0 (loop filter is a no-op)
    e.literal(3, 0)  # sharpness
    e.literal(1, 0)  # lf deltas off
    e.literal(2, 0)  # one DCT partition
    e.literal(7, 0)  # y_ac_qi = 0
    for _ in range(5):
        e.literal(1, 0)  # no quantizer deltas


def _encode_coeff_updates_and_skip(e: BoolEncoder, prob_skip_false: int) -> None:
    for _ in range(4 * 8 * 3 * 11):
        e.put(COEFF_UPDATE_STUB_PROB, 0)  # no updates
    e.literal(1, 1)  # mb_no_coeff_skip on
    e.literal(8, prob_skip_false)


def _encode_header(e: BoolEncoder, prob_skip_false: int) -> None:
    e.literal(1, 0)  # color space
    e.literal(1, 0)  # clamping
    _encode_seg_filter_quant(e)
    e.literal(1, 1)  # refresh entropy
    _encode_coeff_updates_and_skip(e, prob_skip_false)


# ----------------------------------------------------------------------
# intra prediction + reconstruction (skip MBs: recon == prediction)
# ----------------------------------------------------------------------
def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict_block(
    plane: list[list[int]], bx: int, by: int, size: int, mode: int
) -> None:
    """Fill plane[by:by+size][bx:bx+size] in place. Edge conventions:
    above row 127, left column 129, above-left corner follows whichever
    border it belongs to (127 on the top edge, 129 down the left)."""
    up = by > 0
    left = bx > 0
    above_row = (
        [plane[by - 1][bx + i] for i in range(size)] if up else [127] * size
    )
    left_col = (
        [plane[by + i][bx - 1] for i in range(size)] if left else [129] * size
    )
    if up and left:
        corner = plane[by - 1][bx - 1]
    elif up:
        corner = 129  # left border beside a real above row
    else:
        corner = 127  # top border (including the very first block)
    if mode == DC_PRED:
        if up and left:
            # 2*size samples: shift log2(size)+1, round half up
            avg = (sum(above_row) + sum(left_col) + size) >> size.bit_length()
        elif up:
            avg = (sum(above_row) + size // 2) >> (size.bit_length() - 1)
        elif left:
            avg = (sum(left_col) + size // 2) >> (size.bit_length() - 1)
        else:
            avg = 128
        for r in range(size):
            row = plane[by + r]
            for c in range(size):
                row[bx + c] = avg
    elif mode == V_PRED:
        for r in range(size):
            row = plane[by + r]
            for c in range(size):
                row[bx + c] = above_row[c]
    elif mode == H_PRED:
        for r in range(size):
            row = plane[by + r]
            v = left_col[r]
            for c in range(size):
                row[bx + c] = v
    elif mode == TM_PRED:
        for r in range(size):
            row = plane[by + r]
            base = left_col[r] - corner
            for c in range(size):
                row[bx + c] = _clamp(base + above_row[c])
    else:
        raise ValueError(f"vp8: unsupported prediction mode {mode}")


def decode_keyframe(payload: bytes) -> dict:
    """Decode a VP8 keyframe to pixels. Returns
    ``{width, height, y, u, v, modes, header}`` with planes as bytes
    (row-major, cropped to the display size). Refuses (ValueError) on:
    interframes, bad start code, B_PRED, or any non-skipped macroblock
    — see the module boundary note."""
    if len(payload) < 10:
        raise ValueError("vp8: truncated frame — quarantine")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ValueError("vp8: not a keyframe — quarantine")
    part_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code — quarantine")
    w = (payload[6] | (payload[7] << 8)) & 0x3FFF
    h = (payload[8] | (payload[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("vp8: zero dimension — quarantine")
    first = payload[10 : 10 + part_size]
    if len(first) < part_size:
        raise ValueError("vp8: first partition overruns frame — quarantine")
    d = BoolDecoder(first)
    hdr = _decode_header(d)
    if not hdr["mb_no_coeff_skip"]:
        raise ValueError(
            "vp8: stream without mb_no_coeff_skip implies residual tokens "
            "— default coefficient tables not transcribed; quarantine"
        )

    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    y = [[0] * yw for _ in range(yh)]
    u = [[0] * cw for _ in range(ch)]
    v = [[0] * cw for _ in range(ch)]
    modes = []
    for r in range(mb_h):
        for c in range(mb_w):
            skip = d.get(hdr["prob_skip_false"])
            ymode = d.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                raise ValueError(
                    "vp8: B_PRED subblock modes need the untranscribed "
                    "default tables — quarantine"
                )
            uvmode = d.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            if not skip:
                raise ValueError(
                    "vp8: non-skipped macroblock carries residual tokens "
                    "— default coefficient tables not transcribed; "
                    "quarantine"
                )
            _predict_block(y, c * 16, r * 16, 16, ymode)
            _predict_block(u, c * 8, r * 8, 8, uvmode)
            _predict_block(v, c * 8, r * 8, 8, uvmode)
            modes.append(MODE_NAMES[ymode])
    crop = lambda plane, pw, ph: bytes(  # noqa: E731
        plane[rr][cc] for rr in range(ph) for cc in range(pw)
    )
    return {
        "width": w,
        "height": h,
        "y": crop(y, w, h),
        "u": crop(u, (w + 1) // 2, (h + 1) // 2),
        "v": crop(v, (w + 1) // 2, (h + 1) // 2),
        "modes": modes,
        "header": hdr,
        # uncropped (MB-aligned) planes: the reference buffers inter
        # frames motion-compensate from
        "_y2d": y,
        "_u2d": u,
        "_v2d": v,
    }


def encode_keyframe_skip(
    width: int,
    height: int,
    y_mode: int = DC_PRED,
    uv_mode: int = DC_PRED,
    prob_skip_false: int = 30,
) -> bytes:
    """A REAL entropy-coded VP8 keyframe whose macroblocks are all
    skipped (no residual): pixels are pure intra prediction, so the
    decode is exact. One DCT partition of zero bytes follows the first
    partition, per spec."""
    if not (0 < width <= 0x3FFF and 0 < height <= 0x3FFF):
        raise ValueError("vp8: dims out of 14-bit range")
    if y_mode == B_PRED:
        raise ValueError("vp8: encoder does not emit B_PRED")
    e = BoolEncoder()
    _encode_header(e, prob_skip_false)
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    for _ in range(mb_w * mb_h):
        e.put(prob_skip_false, 1)  # mb_skip_coeff = 1
        e.tree(KF_YMODE_TREE, KF_YMODE_PROBS, y_mode)
        e.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uv_mode)
    first = e.flush()
    tag = (0) | (0 << 1) | (1 << 4) | (len(first) << 5)
    return (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + bytes((width & 0xFF, width >> 8, height & 0xFF, height >> 8))
        + first
    )


# ----------------------------------------------------------------------
# inter frames (P-frames) — RFC 6386 §9.7-§9.11, §16-§18 structure over
# the same boolean coder (r12, VERDICT r11 task #4).
#
# DOCUMENTED BOUNDARIES, same discipline as the keyframe side:
# - the mv_ref mode probabilities are CONTEXT-DEPENDENT in the spec
#   (vp8_mode_contexts, untranscribed); MV_REF_STUB_PROBS stands in, so
#   streams from THIS encoder decode exactly while foreign streams may
#   desync and quarantine;
# - the default MV-component probabilities (2 x 19) are untranscribed;
#   MVC_STUB_PROBS stands in (the component CODING STRUCTURE — short
#   tree / long bits with the implied bit 3, §17.2 — is spec-true);
# - the near/nearest candidate scan keeps the spec's neighbor set and
#   2/2/1 weights but simplifies the tie/zero bookkeeping — shared by
#   encoder and decoder, so round-trips are exact;
# - only FULL-PEL, even-integer luma offsets decode (fractional motion
#   needs the untranscribed 6-tap subpel filter bank); SPLITMV and
#   intra MBs inside inter frames refuse for the same table reasons;
# - reference-frame pixels beyond the edge follow the spec's border
#   replication (per-pixel clamp).
# ----------------------------------------------------------------------

ZEROMV, NEARESTMV, NEARMV, NEWMV, SPLITMV = range(5)
MV_MODE_NAMES = {
    ZEROMV: "ZERO", NEARESTMV: "NEAREST", NEARMV: "NEAR", NEWMV: "NEW",
}
MV_REF_TREE = (-ZEROMV, 2, -NEARESTMV, 4, -NEARMV, 6, -NEWMV, -SPLITMV)
MV_REF_STUB_PROBS = (128, 128, 128, 128)
# component prob layout (§17.2): [0] long-vs-short flag, [1] sign,
# [2:9] short tree, [9:19] long bits
MVC_STUB_PROBS = (128,) * 19
SMALL_MV_TREE = (2, 8, 4, 6, 0, -1, -2, -3, 10, 12, -4, -5, -6, -7)

LAST_FRAME, GOLDEN_FRAME, ALTREF_FRAME = "last", "golden", "altref"
_REF_NAMES = (LAST_FRAME, GOLDEN_FRAME, ALTREF_FRAME)


def _decode_mvcomponent(d: BoolDecoder, p: tuple) -> int:
    if d.get(p[0]):  # long form: bits 0..2, then 9..4, bit 3 last
        x = 0
        for i in (0, 1, 2):
            x += d.get(p[9 + i]) << i
        for i in range(9, 3, -1):
            x += d.get(p[9 + i]) << i
        if not (x & 0xFFF0) or d.get(p[9 + 3]):
            x += 8
    else:
        x = d.tree(SMALL_MV_TREE, p[2:9])
    if x and d.get(p[1]):
        x = -x
    return x


def _encode_mvcomponent(e: BoolEncoder, p: tuple, v: int) -> None:
    x = abs(v)
    if x >= 1024:
        raise ValueError("vp8: mv component out of range")
    if x < 8:
        e.put(p[0], 0)
        e.tree(SMALL_MV_TREE, p[2:9], x)
    else:
        e.put(p[0], 1)
        for i in (0, 1, 2):
            e.put(p[9 + i], (x >> i) & 1)
        for i in range(9, 3, -1):
            e.put(p[9 + i], (x >> i) & 1)
        if x & 0xFFF0:  # bit 3 implied when the high bits are all zero
            e.put(p[9 + 3], (x >> 3) & 1)
    if x:
        e.put(p[1], 1 if v < 0 else 0)


def _find_near_mvs(
    grid: list, r: int, c: int, cur_ref: str, sign_bias: dict
) -> tuple:
    """(best, nearest, near) from the above/left/above-left neighbors
    with the spec's 2/2/1 weights; simplified tie bookkeeping (see the
    section boundary note). MVs are component values (pixel offset =
    value / 4)."""
    cands: list[list] = []
    for dr, dc, w in ((-1, 0, 2), (0, -1, 2), (-1, -1, 1)):
        rr, cc = r + dr, c + dc
        if rr < 0 or cc < 0:
            continue
        entry = grid[rr][cc]
        if entry is None:
            continue
        ref_n, mv = entry
        if sign_bias.get(ref_n, 0) != sign_bias.get(cur_ref, 0):
            mv = (-mv[0], -mv[1])
        for item in cands:
            if item[0] == mv:
                item[1] += w
                break
        else:
            cands.append([mv, w])
    cands.sort(key=lambda t: -t[1])  # stable: scan order breaks ties
    nearest = cands[0][0] if cands else (0, 0)
    near = cands[1][0] if len(cands) > 1 else (0, 0)
    return nearest, nearest, near


def _decode_inter_header(d: BoolDecoder) -> dict:
    h: dict = {}
    _decode_seg_filter_quant(d, h)
    h["refresh_golden"] = d.literal(1)
    h["refresh_alternate"] = d.literal(1)
    h["copy_to_golden"] = 0 if h["refresh_golden"] else d.literal(2)
    h["copy_to_alternate"] = 0 if h["refresh_alternate"] else d.literal(2)
    h["sign_bias"] = {
        LAST_FRAME: 0,
        GOLDEN_FRAME: d.literal(1),
        ALTREF_FRAME: d.literal(1),
    }
    h["refresh_entropy"] = d.literal(1)
    h["refresh_last"] = d.literal(1)
    _decode_coeff_updates_and_skip(d, h)
    h["prob_intra"] = d.literal(8)
    h["prob_last"] = d.literal(8)
    h["prob_gf"] = d.literal(8)
    if d.literal(1):  # intra 16x16 mode prob update
        h["ymode_probs"] = tuple(d.literal(8) for _ in range(4))
    if d.literal(1):  # intra chroma mode prob update
        h["uv_probs"] = tuple(d.literal(8) for _ in range(3))
    mvc = [list(MVC_STUB_PROBS), list(MVC_STUB_PROBS)]
    for comp in range(2):
        for i in range(19):
            if d.get(COEFF_UPDATE_STUB_PROB):
                v = d.literal(7)
                mvc[comp][i] = (v << 1) if v else 1
    h["mvc"] = (tuple(mvc[0]), tuple(mvc[1]))
    return h


def _encode_inter_header(
    e: BoolEncoder,
    prob_skip_false: int,
    refresh_golden: int,
    refresh_alternate: int,
    refresh_last: int,
    prob_intra: int,
    prob_last: int,
    prob_gf: int,
) -> None:
    _encode_seg_filter_quant(e)
    e.literal(1, refresh_golden)
    e.literal(1, refresh_alternate)
    if not refresh_golden:
        e.literal(2, 0)  # no buffer copy
    if not refresh_alternate:
        e.literal(2, 0)
    e.literal(1, 0)  # sign bias golden
    e.literal(1, 0)  # sign bias altref
    e.literal(1, 1)  # refresh entropy
    e.literal(1, refresh_last)
    _encode_coeff_updates_and_skip(e, prob_skip_false)
    e.literal(8, prob_intra)
    e.literal(8, prob_last)
    e.literal(8, prob_gf)
    e.literal(1, 0)  # no ymode prob update
    e.literal(1, 0)  # no uv prob update
    for _ in range(2 * 19):
        e.put(COEFF_UPDATE_STUB_PROB, 0)  # no mv prob updates


def _mc_copy(
    dst: list, src: list, bx: int, by: int, size: int, ox: int, oy: int
) -> None:
    """Motion-compensated block copy with border replication (the
    spec's extended reference frame) — ox/oy are integer pixel
    offsets."""
    hh = len(src)
    ww = len(src[0])
    for r in range(size):
        sy = by + r + oy
        sy = 0 if sy < 0 else hh - 1 if sy >= hh else sy
        srow = src[sy]
        drow = dst[by + r]
        for c in range(size):
            sx = bx + c + ox
            sx = 0 if sx < 0 else ww - 1 if sx >= ww else sx
            drow[bx + c] = srow[sx]


def decode_interframe(payload: bytes, refs: dict) -> dict:
    """Decode a VP8 inter frame against ``refs`` (dict with keys
    last/golden/altref, each a prior decode result carrying _y2d/_u2d/
    _v2d). Returns the same shape as decode_keyframe plus per-MB
    ``mvs`` [(ref, mode, mv_x, mv_y)] (component units: pixel = v/4)
    and the refresh flags in ``header``. Refuses (ValueError): intra
    MBs, SPLITMV, fractional/odd-pixel motion, non-skipped MBs — see
    the section boundary note."""
    if len(payload) < 4:
        raise ValueError("vp8: truncated frame — quarantine")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if not tag & 1:
        raise ValueError("vp8: keyframe given to the interframe decoder")
    part_size = tag >> 5
    first = payload[3 : 3 + part_size]
    if len(first) < part_size:
        raise ValueError("vp8: first partition overruns frame — quarantine")
    for name in _REF_NAMES:
        if name not in refs or "_y2d" not in refs[name]:
            raise ValueError(f"vp8: missing reference frame {name!r}")
    w = refs[LAST_FRAME]["width"]
    h = refs[LAST_FRAME]["height"]
    d = BoolDecoder(first)
    hdr = _decode_inter_header(d)
    if not hdr["mb_no_coeff_skip"]:
        raise ValueError(
            "vp8: stream without mb_no_coeff_skip implies residual tokens "
            "— default coefficient tables not transcribed; quarantine"
        )
    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    y = [[0] * (mb_w * 16) for _ in range(mb_h * 16)]
    u = [[0] * (mb_w * 8) for _ in range(mb_h * 8)]
    v = [[0] * (mb_w * 8) for _ in range(mb_h * 8)]
    grid: list = [[None] * mb_w for _ in range(mb_h)]
    mvs = []
    for r in range(mb_h):
        for c in range(mb_w):
            skip = d.get(hdr["prob_skip_false"])
            is_inter = d.get(hdr["prob_intra"])
            if not is_inter:
                raise ValueError(
                    "vp8: intra MB in an inter frame needs the "
                    "untranscribed default mode probabilities — quarantine"
                )
            if not d.get(hdr["prob_last"]):
                ref = LAST_FRAME
            elif not d.get(hdr["prob_gf"]):
                ref = GOLDEN_FRAME
            else:
                ref = ALTREF_FRAME
            best, nearest, near = _find_near_mvs(
                grid, r, c, ref, hdr["sign_bias"]
            )
            mode = d.tree(MV_REF_TREE, MV_REF_STUB_PROBS)
            if mode == SPLITMV:
                raise ValueError(
                    "vp8: SPLITMV needs the untranscribed sub-MV tables "
                    "— quarantine"
                )
            if mode == ZEROMV:
                mv = (0, 0)
            elif mode == NEARESTMV:
                mv = nearest
            elif mode == NEARMV:
                mv = near
            else:  # NEWMV: component deltas added to the best predictor
                dy_c = _decode_mvcomponent(d, hdr["mvc"][0])
                dx_c = _decode_mvcomponent(d, hdr["mvc"][1])
                mv = (best[0] + dx_c, best[1] + dy_c)
            if not skip:
                raise ValueError(
                    "vp8: non-skipped macroblock carries residual tokens "
                    "— default coefficient tables not transcribed; "
                    "quarantine"
                )
            if (mv[0] | mv[1]) & 7:
                raise ValueError(
                    "vp8: fractional/odd-pixel motion needs the "
                    "untranscribed 6-tap subpel filter bank — quarantine"
                )
            grid[r][c] = (ref, mv)
            mvs.append((ref, MV_MODE_NAMES[mode], mv[0], mv[1]))
            src = refs[ref]
            ox, oy = mv[0] // 4, mv[1] // 4
            _mc_copy(y, src["_y2d"], c * 16, r * 16, 16, ox, oy)
            _mc_copy(u, src["_u2d"], c * 8, r * 8, 8, ox // 2, oy // 2)
            _mc_copy(v, src["_v2d"], c * 8, r * 8, 8, ox // 2, oy // 2)
    crop = lambda plane, pw, ph: bytes(  # noqa: E731
        plane[rr][cc] for rr in range(ph) for cc in range(pw)
    )
    return {
        "width": w,
        "height": h,
        "y": crop(y, w, h),
        "u": crop(u, (w + 1) // 2, (h + 1) // 2),
        "v": crop(v, (w + 1) // 2, (h + 1) // 2),
        "mvs": mvs,
        "header": hdr,
        "_y2d": y,
        "_u2d": u,
        "_v2d": v,
    }


def encode_interframe(
    width: int,
    height: int,
    mbs: list,
    prob_skip_false: int = 30,
    refresh_last: int = 1,
    refresh_golden: int = 0,
    refresh_alternate: int = 0,
) -> bytes:
    """A REAL entropy-coded VP8 inter frame, all MBs skipped (pure
    motion compensation). ``mbs`` is one (ref_name, dx_px, dy_px) per
    macroblock in raster order — pixel offsets must be EVEN integers
    (|dx| <= 255) so luma AND chroma land on integer pels. The encoder
    runs the same candidate scan as the decoder and picks ZERO/NEAREST/
    NEAR when the target MV matches the prediction, else NEWMV."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    if len(mbs) != mb_w * mb_h:
        raise ValueError("vp8: mbs length != macroblock count")
    prob_intra = 10  # strongly inter
    prob_last, prob_gf = 100, 100
    e = BoolEncoder()
    _encode_inter_header(
        e, prob_skip_false, refresh_golden, refresh_alternate, refresh_last,
        prob_intra, prob_last, prob_gf,
    )
    sign_bias = {LAST_FRAME: 0, GOLDEN_FRAME: 0, ALTREF_FRAME: 0}
    grid: list = [[None] * mb_w for _ in range(mb_h)]
    i = 0
    for r in range(mb_h):
        for c in range(mb_w):
            ref, dx, dy = mbs[i]
            i += 1
            if ref not in _REF_NAMES:
                raise ValueError(f"vp8: unknown reference {ref!r}")
            if (dx | dy) & 1 or abs(dx) > 255 or abs(dy) > 255:
                raise ValueError(
                    "vp8: pixel offsets must be even ints within +/-255"
                )
            mv = (dx * 4, dy * 4)
            e.put(prob_skip_false, 1)  # mb_skip_coeff = 1
            e.put(prob_intra, 1)  # inter
            e.put(prob_last, 0 if ref == LAST_FRAME else 1)
            if ref != LAST_FRAME:
                e.put(prob_gf, 0 if ref == GOLDEN_FRAME else 1)
            best, nearest, near = _find_near_mvs(grid, r, c, ref, sign_bias)
            if mv == (0, 0):
                e.tree(MV_REF_TREE, MV_REF_STUB_PROBS, ZEROMV)
            elif mv == nearest:
                e.tree(MV_REF_TREE, MV_REF_STUB_PROBS, NEARESTMV)
            elif mv == near:
                e.tree(MV_REF_TREE, MV_REF_STUB_PROBS, NEARMV)
            else:
                e.tree(MV_REF_TREE, MV_REF_STUB_PROBS, NEWMV)
                _encode_mvcomponent(e, MVC_STUB_PROBS, mv[1] - best[1])
                _encode_mvcomponent(e, MVC_STUB_PROBS, mv[0] - best[0])
            grid[r][c] = (ref, mv)
    first = e.flush()
    tag = 1 | (0 << 1) | (1 << 4) | (len(first) << 5)
    return (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF)) + first
    )


def decode_sequence(payloads: list) -> list:
    """Decode a frame sequence, maintaining the last/golden/altref
    reference buffers per the spec's refresh/copy semantics (keyframes
    refresh all three). Returns the per-frame decode dicts."""
    refs: dict = {}
    out = []
    for payload in payloads:
        if len(payload) < 3:
            raise ValueError("vp8: truncated frame — quarantine")
        if payload[0] & 1:
            f = decode_interframe(payload, refs)
            h = f["header"]
            last = refs[LAST_FRAME]
            golden = refs[GOLDEN_FRAME]
            altref = refs[ALTREF_FRAME]
            new_golden = (
                f if h["refresh_golden"]
                else last if h["copy_to_golden"] == 1
                else altref if h["copy_to_golden"] == 2
                else golden
            )
            new_altref = (
                f if h["refresh_alternate"]
                else last if h["copy_to_alternate"] == 1
                else golden if h["copy_to_alternate"] == 2
                else altref
            )
            refs[GOLDEN_FRAME] = new_golden
            refs[ALTREF_FRAME] = new_altref
            if h["refresh_last"]:
                refs[LAST_FRAME] = f
        else:
            f = decode_keyframe(payload)
            refs = {LAST_FRAME: f, GOLDEN_FRAME: f, ALTREF_FRAME: f}
        out.append(f)
    return out
