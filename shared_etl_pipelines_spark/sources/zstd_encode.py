"""zstd frame WRITER — RFC 8878, store mode (raw + RLE blocks).

The repo's zstd side was decode-only (sources/zstd_decode.py); this
module closes the EMIT half for the shapes a corpus pipeline actually
needs to ship: spec-valid frames that ANY zstd decoder accepts. Store
mode trades ratio for simplicity — raw blocks carry literals verbatim
and runs collapse to RLE blocks — which is exactly what the format's
own `--no-compress` / ZSTD_btultra-with-no-matches paths emit. Frames
carry the frame-content size and the XXH64 content checksum, so
truncation and corruption stay detectable downstream.

DOCUMENTED BOUNDARY: no FSE/Huffman-compressed blocks are produced
(the repo decodes them; producing them buys ratio, not correctness,
and pyarrow's bundled zstd remains the emitter of choice when ratio
matters). Dictionary frames are not produced.

Cross-checks: pyarrow's bundled reference zstd decodes every frame
this module writes (tests/test_zstd_encode.py), and so does the
repo's own RFC 8878 decoder — two independent decoders over the same
bytes.
"""

from __future__ import annotations

import struct

from shared_etl_pipelines_spark.sources.zstd_decode import xxh64

__all__ = ["zstd_compress"]

_FRAME_MAGIC = 0xFD2FB528
_BLOCK_MAX = 128 * 1024  # Block_Maximum_Size cap (window >= 128 KiB here)
_MIN_RLE_RUN = 64  # below this a run is not worth a block boundary


def _frame_header(n: int) -> bytes:
    """Single-segment frame header: FHD + smallest frame-content size."""
    checksum_bit = 1 << 2
    single_segment = 1 << 5
    if n <= 255:
        fcs_flag = 0
        fcs = struct.pack("<B", n)
    elif n <= 65535 + 256:
        fcs_flag = 1
        fcs = struct.pack("<H", n - 256)
    elif n < 1 << 32:
        fcs_flag = 2
        fcs = struct.pack("<I", n)
    else:
        fcs_flag = 3
        fcs = struct.pack("<Q", n)
    fhd = (fcs_flag << 6) | single_segment | checksum_bit
    return bytes([fhd]) + fcs


def _blocks(data: bytes) -> list[tuple[int, int, bytes]]:
    """(btype, regenerated_size, payload) list: RLE blocks for long
    runs, raw blocks otherwise, each regenerating at most _BLOCK_MAX
    bytes."""
    out: list[tuple[int, int, bytes]] = []
    n = len(data)
    i = 0
    raw_start = 0

    def flush_raw(upto: int) -> None:
        s = raw_start
        while s < upto:
            chunk = data[s : min(s + _BLOCK_MAX, upto)]
            out.append((0, len(chunk), chunk))
            s += len(chunk)

    while i < n:
        b = data[i]
        j = i + 1
        while j < n and data[j] == b:
            j += 1
        run = j - i
        if run >= _MIN_RLE_RUN:
            flush_raw(i)
            r = run
            while r > 0:
                chunk = min(r, _BLOCK_MAX)
                out.append((1, chunk, bytes([b])))
                r -= chunk
            raw_start = j
        i = j
    flush_raw(n)
    if not out:
        out.append((0, 0, b""))  # empty frame still needs one (last) block
    return out


def zstd_compress(data: bytes) -> bytes:
    """One spec-valid zstd frame: single-segment header with the frame
    content size, raw/RLE blocks, XXH64 content checksum."""
    parts = [struct.pack("<I", _FRAME_MAGIC), _frame_header(len(data))]
    blocks = _blocks(data)
    for k, (btype, size, payload) in enumerate(blocks):
        last = 1 if k == len(blocks) - 1 else 0
        header = last | (btype << 1) | (size << 3)
        parts.append(header.to_bytes(3, "little"))
        parts.append(payload)
    parts.append(struct.pack("<I", xxh64(data) & 0xFFFFFFFF))
    return b"".join(parts)
