"""Pure-python WAV (RIFF/PCM) codec — real audio decode for the
multimodal pipeline.

WAV PCM needs only struct unpacking, so like PNG (sources/png.py) it
gets a REAL codec instead of the documented stub: RIFF container walk,
'fmt ' validation, 16-bit PCM samples to numpy. Scope (asserted):
format tag 1 (PCM), 16-bit, any channel count / sample rate. The
encoder exists for fixtures and round-trip tests.

Reference parity note: the reference moves no audio; this exists for
the LLM multimodal mandate (audio assets as opaque binary + typed
metadata, decoded inside Arrow-batched mapInPandas).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a 16-bit PCM WAV into ((n_samples, channels) int16 array,
    info{sample_rate, channels, bits, n_samples})."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    off = 12
    fmt = None
    samples = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        body = data[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _byterate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (only PCM)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (only 16)")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            samples = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    channels, rate, bits = fmt
    arr = np.frombuffer(samples, dtype="<i2")
    n = len(arr) // channels
    arr = arr[: n * channels].reshape(n, channels)
    return arr, {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
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
