"""Pure-python WAV (RIFF) codec — real audio decode for the multimodal
pipeline.

WAV needs only struct unpacking, so like PNG (sources/png.py) it gets a
REAL codec instead of the documented stub: RIFF container walk, 'fmt '
validation, samples to numpy. Scope (asserted): format tag 1 (16-bit
PCM) and format tag 7 (8-bit G.711 mu-law — the telephony/call-center
encoding real speech corpora arrive in), any channel count / sample
rate. Mu-law expands through the ITU G.711 segment formula
  magnitude = (((mant << 3) + 0x84) << exp) - 0x84
via a 256-entry table; the companding encoder exists for fixtures and
round-trip tests (decode(encode(x)) == x exactly on the 255 mu-law
codepoint magnitudes, quantized otherwise).

Reference parity note: the reference moves no audio; this exists for
the LLM multimodal mandate (audio assets as opaque binary + typed
metadata, decoded inside Arrow-batched mapInPandas).
"""

from __future__ import annotations

import struct

import numpy as np


def _mulaw_decode_table() -> np.ndarray:
    """256-entry int16 expansion table from the G.711 formula."""
    codes = np.arange(256, dtype=np.int64)
    u = ~codes & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


_MULAW_TABLE = _mulaw_decode_table()

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """Compand int16 samples to 8-bit mu-law codes (vectorized G.711)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = floor(log2(mag)) - 7: mag < 2^16 is exactly
    # representable in float64, so frexp's exponent is exact
    exp = np.clip(np.frexp(mag.astype(np.float64))[1] - 8, 0, 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """Expand 8-bit mu-law codes to int16 samples."""
    return _MULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def _alaw_decode_table() -> np.ndarray:
    """256-entry int16 expansion table from the G.711 A-law formula
    (the European telephony twin of mu-law; format tag 6)."""
    codes = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (codes & 0x70) >> 4
    mant = codes & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(codes & 0x80, mag, -mag).astype(np.int16)


_ALAW_TABLE = _alaw_decode_table()
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int64
)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """Compand int16 samples to 8-bit A-law codes (vectorized G.711,
    the public-domain g711.c algorithm)."""
    x = np.asarray(samples, dtype=np.int64) >> 3  # 13-bit domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    pcm = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, pcm, side="left")
    shift = np.where(seg < 2, 1, np.maximum(seg, 1))
    aval = np.where(
        seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | ((pcm >> shift) & 0x0F)
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """Expand 8-bit A-law codes to int16 samples."""
    return _ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PCM (tag 1, 16-bit), mu-law (tag 7, 8-bit), or IMA
    ADPCM (tag 0x11, 4-bit mono) WAV into ((n_samples, channels) int16
    array, info{sample_rate, channels, bits, format_tag, n_samples}).
    Compressed tags expand to int16, so downstream stats see one
    sample domain."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    off = 12
    fmt = None
    samples = None
    block_align = 0
    fact_n = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        body = data[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _byterate, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == 1:
                if bits != 16:
                    raise ValueError(f"unsupported PCM bit depth {bits} (only 16)")
            elif tag in (6, 7):
                if bits != 8:
                    raise ValueError(
                        f"G.711 requires 8-bit samples, got {bits}"
                    )
            elif tag == 0x11:
                if bits != 4:
                    raise ValueError(f"IMA ADPCM requires 4-bit samples, got {bits}")
                if channels != 1:
                    raise ValueError("IMA ADPCM decode supports mono only")
            else:
                raise ValueError(
                    f"unsupported WAV format tag {tag} (PCM=1, A-law=6, "
                    "mu-law=7, IMA ADPCM=0x11)"
                )
            fmt = (tag, channels, rate, bits)
        elif cid == b"fact":
            (fact_n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            samples = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, bits = fmt
    if tag == 7:
        arr = mulaw_expand(np.frombuffer(samples, dtype=np.uint8))
    elif tag == 6:
        arr = alaw_expand(np.frombuffer(samples, dtype=np.uint8))
    elif tag == 0x11:
        spb = (block_align - 4) * 2 + 1
        n_total = (
            fact_n
            if fact_n is not None
            else (len(samples) // block_align) * spb
        )
        arr = _decode_adpcm(samples, block_align, n_total)
    else:
        arr = np.frombuffer(samples, dtype="<i2")
    n = len(arr) // channels
    arr = arr[: n * channels].reshape(n, channels)
    return arr, {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "format_tag": tag,
        "n_samples": n,
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16 array — (n,) mono or (n, channels) — as PCM WAV."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    body = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_wav_alaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples — (n,) mono or (n, channels) — as an 8-bit
    G.711 A-law WAV (format tag 6)."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    body = alaw_compress(a.reshape(-1)).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 6, channels, sample_rate, sample_rate * channels, channels, 8
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples — (n,) mono or (n, channels) — as an 8-bit
    G.711 mu-law WAV (format tag 7, the telephony container)."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    body = mulaw_compress(a.reshape(-1)).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 7, channels, sample_rate, sample_rate * channels, channels, 8
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11) — the 4-bit block-compressed speech
# format (dictation corpora, game audio, old telephony dumps). Each
# block is self-contained: a 4-byte header (verbatim int16 first
# sample + step-table index) then two samples per byte, low nibble
# first — so blocks decode independently and a corrupt block never
# poisons its neighbors (the property that makes the format splittable
# at scale).
# ---------------------------------------------------------------------------
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX_DELTA = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_nibble(pred: int, index: int, n: int) -> tuple[int, int]:
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + int(_IMA_INDEX_DELTA[n & 7])))
    return pred, index


def _ima_encode_sample(pred: int, index: int, x: int) -> tuple[int, int, int]:
    """Quantize one sample against (pred, index); returns
    (nibble, new_pred, new_index) — the canonical bit-greedy IMA rule."""
    step = int(_IMA_STEPS[index])
    delta = x - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    pred, index = _ima_decode_nibble(pred, index, n)
    return n, pred, index


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Compress mono int16 samples as IMA ADPCM WAV (tag 0x11). Each
    block holds 1 header sample + (block_align-4)*2 nibble samples;
    the tail block pads with repeats of the last sample (the decoder
    stops at the fact-chunk sample count)."""
    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    n_total = len(a)
    if n_total == 0:
        raise ValueError("empty sample array")
    spb = (block_align - 4) * 2 + 1
    body = bytearray()
    pos = 0
    while pos < n_total:
        chunk = a[pos : pos + spb]
        pred = int(chunk[0])
        # header index: restart at 0 each block (self-contained blocks)
        index = 0
        body += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        last = int(chunk[-1])
        for j in range(1, spb):
            x = int(chunk[j]) if j < len(chunk) else last
            nb, pred, index = _ima_encode_sample(pred, index, x)
            nibbles.append(nb)
        for k in range(0, len(nibbles), 2):
            body.append(nibbles[k] | (nibbles[k + 1] << 4))
        pos += spb
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        sample_rate * block_align // spb if spb else sample_rate,
        block_align, 4, 2, spb,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n_total)
    chunks += b"data" + struct.pack("<I", len(body)) + bytes(body)
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_wav_adpcm_blocks(
    blocks: list, sample_rate: int = 8000
) -> bytes:
    """Assemble an IMA ADPCM WAV from explicit (first_sample,
    step_index, nibbles) blocks — the fixture writer: decoded output is
    then a pure function of the planted header + nibble stream. All
    blocks must carry the same (even) nibble count."""
    nnib = len(blocks[0][2])
    if nnib % 2:
        raise ValueError("nibble count per block must be even")
    block_align = 4 + nnib // 2
    spb = nnib + 1
    body = bytearray()
    for pred, index, nibbles in blocks:
        if len(nibbles) != nnib:
            raise ValueError("ragged blocks")
        body += struct.pack("<hBB", int(pred), int(index), 0)
        for k in range(0, nnib, 2):
            body.append((nibbles[k] & 0xF) | ((nibbles[k + 1] & 0xF) << 4))
    n_total = spb * len(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate, sample_rate * block_align // spb,
        block_align, 4, 2, spb,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n_total)
    chunks += b"data" + struct.pack("<I", len(body)) + bytes(body)
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _decode_adpcm(samples: bytes, block_align: int, n_total: int) -> np.ndarray:
    spb = (block_align - 4) * 2 + 1
    out = np.empty(n_total, dtype=np.int16)
    w = 0
    for boff in range(0, len(samples), block_align):
        if w >= n_total:
            break
        block = samples[boff : boff + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block")
        pred, index, _r = struct.unpack_from("<hBB", block, 0)
        if not 0 <= index <= 88:
            raise ValueError(f"bad ADPCM step index {index}")
        out[w] = pred
        w += 1
        emitted = 1
        for byte in block[4:]:
            for n in (byte & 0xF, byte >> 4):
                if emitted >= spb or w >= n_total:
                    break
                pred, index = _ima_decode_nibble(pred, index, n)
                out[w] = pred
                w += 1
                emitted += 1
    return out[:w]
