"""Pure-python FLAC codec — STREAMINFO, frame headers, CONSTANT /
VERBATIM / FIXED / LPC subframes, Rice residuals, CRC-8/16 + MD5
integrity.

FLAC is the lossless audio format crawl corpora actually carry next
to WAV/MP3; before this module those blobs had no decode path
(VERDICT r7 missing #3 follow-on, round-8 item 6). Everything here is
the public format (RFC 9639 / the xiph spec):

- ``fLaC`` magic, metadata blocks (STREAMINFO parsed: block/frame
  sizes, 20-bit sample rate, channels, bits-per-sample, 36-bit total
  samples, MD5 of the unencoded samples)
- frames: 14-bit sync, fixed-blocksize strategy with UTF-8-coded
  frame index, blocksize/sample-rate/sample-size code tables, CRC-8
  header check, CRC-16 whole-frame check
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the polynomial
  predictors), LPC any order (quantized coefficients + shift)
- residuals: Rice method 0 (4-bit params) and 1 (5-bit), multi-
  partition layout, escape-coded raw partitions
- channels: mono/stereo independent assignment AND the three stereo
  DECORRELATION modes (left/side, right/side, mid/side — what real
  stereo encoders emit; the side subframe carries one extra bit)

Integrity is enforced on decode: header CRC-8, frame CRC-16 and the
STREAMINFO MD5 all verify, so a flipped byte anywhere quarantines the
blob instead of shipping wrong samples — the same fail-loud contract
as the CSV/XML quarantine ingests.

The encoder emits real multi-frame streams and can force a subframe
family per call (fixture corpora sweep all four); its Rice parameter
choice is mean-magnitude-based with the escape fallback.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["is_flac", "decode_flac", "encode_flac"]


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


# ---------------------------------------------------------------------------
# bit IO (MSB-first) and CRCs
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned bit buffer")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos * 8

    def read(self, bits: int) -> int:
        end = self.pos + bits
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        out = 0
        p = self.pos
        while bits:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, bits)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            p += take
            bits -= take
        self.pos = p
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code (corrupt Rice stream)")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_coded(value: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if value < 0x80:
        return bytes([value])
    out = []
    # n-byte form carries (7 - n) + 6 * (n - 1) payload bits
    nbytes = next(
        n for n in range(2, 8) if value < (1 << (7 - n + 6 * (n - 1)))
    )
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | (value >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((value >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x80
    while first & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8-coded frame number")
    value = first & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded continuation byte")
        value = (value << 6) | (c & 0x3F)
    return value


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _read_residual(br: _BitReader, n: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("block size not divisible by rice partitions")
    out: list[int] = []
    for part in range(nparts):
        count = n // nparts - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("rice partition shorter than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _predict(warm: list[int], coeffs: list[int], shift: int, resid: list[int]) -> list[int]:
    out = list(warm)
    for r in resid:
        acc = 0
        for j, c in enumerate(coeffs):
            acc += c * out[-1 - j]
        out.append(r + (acc >> shift))
    return out


def _read_subframe(br: _BitReader, n: int, bps: int) -> tuple[str, list[int]]:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):  # wasted bits flag: unary count - 1
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if t == 0:
        kind, samples = "CONSTANT", [br.read_signed(eff)] * n
    elif t == 1:
        kind, samples = "VERBATIM", [br.read_signed(eff) for _ in range(n)]
    elif 8 <= t <= 12:
        order = t - 8
        kind = "FIXED"
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, n, order)
        samples = _predict(warm, _FIXED_COEFFS[order], 0, resid)
    elif t >= 32:
        order = (t & 0x1F) + 1
        kind = "LPC"
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, n, order)
        samples = _predict(warm, coeffs, shift, resid)
    else:
        raise ValueError(f"reserved subframe type {t:06b}")
    if wasted:
        samples = [s << wasted for s in samples]
    return kind, samples


def decode_flac(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a FLAC stream to ((n_samples, channels) int32, info).

    info: sample_rate, channels, bps, n_samples, n_frames,
    subframe_types (sorted unique kinds seen). Stereo decorrelation
    (channel assignments 8/9/10) reconstructs L/R exactly. CRC-8/
    CRC-16/MD5 all verify — any mismatch raises (the quarantine
    signal)."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            br = _BitReader(body)
            streaminfo = {
                "min_block": br.read(16), "max_block": br.read(16),
                "min_frame": br.read(24), "max_frame": br.read(24),
                "sample_rate": br.read(20),
            }
            streaminfo["channels"] = br.read(3) + 1
            streaminfo["bps"] = br.read(5) + 1
            streaminfo["n_samples"] = br.read(36)
            streaminfo["md5"] = body[18:34]
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    sr, ch, bps = (
        streaminfo["sample_rate"], streaminfo["channels"], streaminfo["bps"]
    )
    frames: list[list[list[int]]] = []
    kinds: set[str] = set()
    n_frames = 0
    total = 0
    # STREAMINFO total-samples 0 means UNKNOWN length (the spec-legal
    # value streamed encoders write — review r8 #1): drain frames to
    # EOF instead of silently returning zero samples.
    promised = streaminfo["n_samples"]
    while pos < len(data) and (promised == 0 or total < promised):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("reserved frame header bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        if ca > 10:
            raise ValueError(f"reserved channel assignment {ca}")
        # 8/9/10 are the stereo DECORRELATION modes real encoders emit
        # (left/side, right/side, mid/side) — two channels, the side
        # subframe carrying one extra bit
        nch = ca + 1 if ca <= 7 else 2
        if nch != ch:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame header bit set")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0000")
        elif bs_code == 1:
            n = 192
        elif 2 <= bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code 1111")
        elif sr_code and sr_code in _SAMPLE_RATES:
            pass  # table rate; STREAMINFO stays authoritative
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if fbps is None:
            raise ValueError(f"reserved sample-size code {ss_code:03b}")
        br.align()
        header_bytes = data[frame_start : br.byte_pos()]
        crc8 = br.read(8)
        if _crc8(header_bytes) != crc8:
            raise ValueError("frame header CRC-8 mismatch — quarantine")
        chans = []
        for ci in range(nch):
            # the SIDE channel carries one extra sample bit: channel 1
            # for left/side (8) and mid/side (10), channel 0 for
            # right/side (9) — ISO/RFC 9639 frame semantics
            extra = 0
            if ca == 8 and ci == 1 or ca == 10 and ci == 1:
                extra = 1
            elif ca == 9 and ci == 0:
                extra = 1
            kind, samples = _read_subframe(br, n, fbps + extra)
            kinds.add(kind)
            chans.append(samples)
        if ca == 8:  # left/side: R = L - side
            chans = [chans[0], [l - s for l, s in zip(chans[0], chans[1])]]
        elif ca == 9:  # right/side: L = R + side
            chans = [[r + s for s, r in zip(chans[0], chans[1])], chans[1]]
        elif ca == 10:  # mid/side: reconstruct from (mid, side)
            left, right = [], []
            for m, sdiff in zip(chans[0], chans[1]):
                mm = (m << 1) | (sdiff & 1)
                left.append((mm + sdiff) >> 1)
                right.append((mm - sdiff) >> 1)
            chans = [left, right]
        br.align()
        body_end = br.byte_pos()
        crc16 = br.read(16)
        if _crc16(data[frame_start:body_end]) != crc16:
            raise ValueError("frame CRC-16 mismatch — quarantine")
        frames.append(chans)
        total += n
        n_frames += 1
        pos = br.byte_pos()
    if promised and total != promised:
        raise ValueError(
            f"decoded {total} samples, STREAMINFO promises {promised}"
        )
    if total == 0:
        raise ValueError("FLAC stream decoded zero samples — quarantine")
    out = np.zeros((total, ch), dtype=np.int32)
    row = 0
    for chans in frames:
        n = len(chans[0])
        for c, samples in enumerate(chans):
            out[row : row + n, c] = samples
        row += n
    # MD5 over the little-endian unencoded samples (interleaved)
    width = (bps + 7) // 8
    inter = out.astype("<i8").reshape(-1)
    raw = b"".join(
        int(v).to_bytes(width, "little", signed=True) for v in inter
    )
    if streaminfo["md5"] != b"\x00" * 16 and hashlib.md5(raw).digest() != streaminfo["md5"]:
        raise ValueError("STREAMINFO MD5 mismatch — quarantine")
    return out, {
        "sample_rate": sr,
        "channels": ch,
        "bps": bps,
        "n_samples": total,
        "n_frames": n_frames,
        "subframe_types": ",".join(sorted(kinds)),
    }


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------
def _write_residual(bw: _BitWriter, resid: list[int]) -> None:
    """Single-partition Rice (method 0), escape when params blow up."""
    if resid:
        mean = sum(
            (r << 1) if r >= 0 else ((-r << 1) - 1) for r in resid
        ) // len(resid)
        param = max(0, mean.bit_length() - 1)
    else:
        param = 0
    bw.write(0, 2)  # method 0: 4-bit params
    bw.write(0, 4)  # partition order 0
    if param >= 15:
        raw = max((abs(r) + 1).bit_length() + 1 for r in resid)
        bw.write(15, 4)
        bw.write(raw, 5)
        for r in resid:
            bw.write(r & ((1 << raw) - 1), raw)
        return
    bw.write(param, 4)
    for r in resid:
        u = (r << 1) if r >= 0 else ((-r << 1) - 1)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(
    bw: _BitWriter, samples: list[int], bps: int, mode: str
) -> None:
    if mode == "CONSTANT":
        if any(s != samples[0] for s in samples):
            raise ValueError("CONSTANT subframe over non-constant samples")
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(samples[0] & ((1 << bps) - 1), bps)
    elif mode == "VERBATIM":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write(s & ((1 << bps) - 1), bps)
    elif mode.startswith("FIXED"):
        order = int(mode[-1])
        coeffs = _FIXED_COEFFS[order]
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write(s & ((1 << bps) - 1), bps)
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
            for i in range(order, len(samples))
        ]
        _write_residual(bw, resid)
    elif mode == "LPC1":
        # order-1 LPC, coefficient 2 with shift 1 (i.e. predict s[t-1])
        order, prec, shift, coeffs = 1, 15, 1, [2]
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write(s & ((1 << bps) - 1), bps)
        bw.write(prec - 1, 4)
        bw.write(shift & 0x1F, 5)
        for c in coeffs:
            bw.write(c & ((1 << prec) - 1), prec)
        resid = [
            samples[i] - ((sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))) >> shift)
            for i in range(order, len(samples))
        ]
        _write_residual(bw, resid)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 256,
    mode: str = "FIXED2",
    stereo_mode: str | None = None,
) -> bytes:
    """(n,) or (n, channels) int array -> FLAC bytes. ``mode`` forces
    the subframe family per frame: CONSTANT (requires constant input),
    VERBATIM, FIXED0-4, LPC1. Fixed-blocksize stream, one subframe per
    channel, single-partition Rice residuals."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_total, ch = arr.shape
    if ch > 2:
        raise ValueError("encoder supports mono/stereo only")
    ca_codes = {None: ch - 1, "left_side": 8, "right_side": 9, "mid_side": 10}
    if stereo_mode not in ca_codes:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if stereo_mode is not None and ch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError(f"samples out of {bps}-bit range")
    width = (bps + 7) // 8
    raw = b"".join(
        int(v).to_bytes(width, "little", signed=True)
        for v in arr.reshape(-1)
    )
    md5 = hashlib.md5(raw).digest()
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    body = si.getvalue() + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    frame_idx = 0
    for start in range(0, n_total, block_size):
        blk = arr[start : start + block_size]
        n = blk.shape[0]
        # a predictor of order k needs k warmup samples plus at least
        # one residual: clamp the mode for short (tail) blocks — found
        # by the round-8 property sweep (n=1 with FIXED2+)
        blk_mode = mode
        if mode.startswith("FIXED"):
            blk_mode = f"FIXED{min(int(mode[-1]), max(n - 1, 0))}"
        elif mode == "LPC1" and n < 2:
            blk_mode = "FIXED0"
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize-1 in 16 bits at header end
        bw.write(0, 4)  # sample rate from STREAMINFO
        bw.write(ca_codes[stereo_mode], 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw.write(0, 1)
        for b in _utf8_coded(frame_idx):
            bw.write(b, 8)
        bw.write(n - 1, 16)
        header = bw.getvalue()
        bw2 = _BitWriter()
        for b in header:
            bw2.write(b, 8)
        bw2.write(_crc8(header), 8)
        if stereo_mode is None:
            subchans = [
                ([int(v) for v in blk[:, c]], bps) for c in range(ch)
            ]
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [a - b for a, b in zip(left, right)]
            if stereo_mode == "left_side":
                subchans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                subchans = [(side, bps + 1), (right, bps)]
            else:  # mid_side: mid drops the shared low bit side carries
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                subchans = [(mid, bps), (side, bps + 1)]
        for chan, cbps in subchans:
            _encode_subframe(bw2, chan, cbps, blk_mode)
        bw2.align()
        frame_body = bw2.getvalue()
        out += frame_body + struct.pack(">H", _crc16(frame_body))
        frame_idx += 1
    return bytes(out)
