"""LZ4 block and frame formats — pure Python, the PUBLIC specs
(github.com/lz4/lz4: lz4_Block_format.md, lz4_Frame_format.md) plus
XXH32 (github.com/Cyan4973/xxHash spec), which the frame format's
header/content checksums require.

LZ4 is the other workhorse page/stream codec next to snappy (parquet
LZ4_RAW pages, kafka, zstd's sibling in every lakehouse). pyarrow
bundles the reference implementation, so tests cross-check BOTH
directions against independent C++ code: ``lz4_raw`` (bare block) and
``lz4`` (frame).

Block format: sequences of [token | literal-length extras | literals |
2-byte LE offset | match-length extras]; lengths of 15 in a nibble
extend with 255-bytes; matches are >= 4 bytes and may overlap forward;
the last sequence is literals-only. Frame format: magic 0x184D2204,
FLG/BD descriptor + XXH32 header checksum byte, data blocks sized by a
4-byte LE word whose high bit marks "stored uncompressed", a zero end
mark, and an optional XXH32 content checksum.

Truncation, bad magic, offset lies, and checksum mismatches refuse
with ValueError.
"""

from __future__ import annotations

import struct

__all__ = [
    "xxh32",
    "lz4_block_decompress",
    "lz4_block_compress",
    "lz4_frame_decompress",
    "lz4_frame_compress",
]

_MAX_OUTPUT = 1 << 30
_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)
_M = 0xFFFFFFFF


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 one-shot (spec-exact)."""
    n = len(data)
    p = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while p + 16 <= n:
            lane = struct.unpack_from("<4I", data, p)
            v1 = (_rotl((v1 + lane[0] * _P2) & _M, 13) * _P1) & _M
            v2 = (_rotl((v2 + lane[1] * _P2) & _M, 13) * _P1) & _M
            v3 = (_rotl((v3 + lane[2] * _P2) & _M, 13) * _P1) & _M
            v4 = (_rotl((v4 + lane[3] * _P2) & _M, 13) * _P1) & _M
            p += 16
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while p + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, p)
        acc = (_rotl((acc + lane * _P3) & _M, 17) * _P4) & _M
        p += 4
    while p < n:
        acc = (_rotl((acc + data[p] * _P5) & _M, 11) * _P1) & _M
        p += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M
    acc ^= acc >> 13
    acc = (acc * _P3) & _M
    acc ^= acc >> 16
    return acc


# ----------------------------------------------------------------------
# block format
# ----------------------------------------------------------------------
def lz4_block_decompress(
    buf: bytes, expected: int | None = None, history: bytes = b""
) -> bytes:
    """``history`` is the already-decoded window a block-DEPENDENT
    frame's matches may reach back into (up to 64 KiB per spec)."""
    out = bytearray(history)
    hist = len(history)
    p = 0
    n = len(buf)
    if expected is not None and expected > _MAX_OUTPUT:
        raise ValueError("lz4: declared output too large — quarantine")
    while p < n:
        token = buf[p]
        p += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if p >= n:
                    raise ValueError("lz4: truncated literal length")
                b = buf[p]
                p += 1
                lit += b
                if b != 255:
                    break
        if p + lit > n:
            raise ValueError("lz4: literals overrun input")
        out += buf[p : p + lit]
        p += lit
        if p == n:
            break  # last sequence: literals only
        if p + 2 > n:
            raise ValueError("lz4: truncated match offset")
        off = int.from_bytes(buf[p : p + 2], "little")
        p += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4: invalid match offset — quarantine")
        ml = token & 0xF
        if ml == 15:
            while True:
                if p >= n:
                    raise ValueError("lz4: truncated match length")
                b = buf[p]
                p += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        if off >= ml:
            start = len(out) - off
            out += out[start : start + ml]
        else:  # overlapping forward copy
            start = len(out) - off
            for i in range(ml):
                out.append(out[start + i])
        if len(out) > _MAX_OUTPUT:
            raise ValueError("lz4: output exceeds budget — quarantine")
    if expected is not None and len(out) - hist != expected:
        raise ValueError(
            f"lz4: output {len(out) - hist} != declared {expected} — quarantine"
        )
    return bytes(out[hist:])


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy hash compressor producing VALID block output (the
    cross-check is that the reference decoder accepts it). Spec end
    rules honored: the last 5 bytes are always literals and a match
    never starts within the last 12 bytes."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0

    def lengths(ln: int) -> list[int]:
        if ln < 15:
            return []
        extra = []
        ln -= 15
        while ln >= 255:
            extra.append(255)
            ln -= 255
        extra.append(ln)
        return extra

    def emit(lit_lo: int, lit_hi: int, off: int | None, ml: int) -> None:
        lit = lit_hi - lit_lo
        token = min(lit, 15) << 4
        if off is not None:
            token |= min(ml - 4, 15)
        out.append(token)
        out.extend(lengths(lit))
        out.extend(data[lit_lo:lit_hi])
        if off is not None:
            out.extend(off.to_bytes(2, "little"))
            out.extend(lengths(ml - 4))

    while i + 12 <= n:  # spec: no match in the last 12 bytes
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            m = 4
            limit = n - 5 - i  # last 5 bytes must stay literals
            while m < limit and data[cand + m] == data[i + m]:
                m += 1
            if m >= 4:
                emit(lit_start, i, i - cand, m)
                i += m
                lit_start = i
                continue
        i += 1
    if lit_start < n or n == 0:
        emit(lit_start, n, None, 0)
    return bytes(out)


# ----------------------------------------------------------------------
# frame format
# ----------------------------------------------------------------------
_FRAME_MAGIC = 0x184D2204
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_decompress(buf: bytes) -> bytes:
    if len(buf) < 7 or struct.unpack_from("<I", buf, 0)[0] != _FRAME_MAGIC:
        raise ValueError("lz4: bad frame magic — quarantine")
    flg = buf[4]
    bd = buf[5]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    b_indep = bool(flg & 0x20)  # noqa: F841 (parsed; both modes decode)
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    if flg & 0x03:
        raise ValueError("lz4: reserved/dict FLG bits set — quarantine")
    bmax = _BD_SIZES.get((bd >> 4) & 0x7)
    if bmax is None or bd & 0x8F:
        raise ValueError("lz4: bad BD byte — quarantine")
    p = 6
    declared = None
    if c_size:
        declared = struct.unpack_from("<Q", buf, p)[0]
        p += 8
    hc = buf[p]
    p += 1
    want = (xxh32(buf[4:p - 1]) >> 8) & 0xFF
    if hc != want:
        raise ValueError("lz4: header checksum mismatch — quarantine")
    out = bytearray()
    while True:
        if p + 4 > len(buf):
            raise ValueError("lz4: truncated block size word")
        (word,) = struct.unpack_from("<I", buf, p)
        p += 4
        if word == 0:
            break
        stored = bool(word & 0x80000000)
        bsize = word & 0x7FFFFFFF
        if bsize > bmax:
            raise ValueError("lz4: block exceeds BD max size — quarantine")
        if p + bsize > len(buf):
            raise ValueError("lz4: block overruns input")
        block = buf[p : p + bsize]
        p += bsize
        if b_checksum:
            if p + 4 > len(buf):
                raise ValueError("lz4: truncated block checksum")
            (bh,) = struct.unpack_from("<I", buf, p)
            p += 4
            if xxh32(block) != bh:
                raise ValueError("lz4: block checksum mismatch — quarantine")
        if stored:
            out += block
        else:
            # linked-block mode: matches may reach into the previous
            # 64 KiB of decoded output
            hist = b"" if b_indep else bytes(out[-65536:])
            out += lz4_block_decompress(block, history=hist)
        if len(out) > _MAX_OUTPUT:
            raise ValueError("lz4: output exceeds budget — quarantine")
    if c_checksum:
        if p + 4 > len(buf):
            raise ValueError("lz4: truncated content checksum")
        (ch,) = struct.unpack_from("<I", buf, p)
        p += 4
        if xxh32(bytes(out)) != ch:
            raise ValueError("lz4: content checksum mismatch — quarantine")
    if declared is not None and len(out) != declared:
        raise ValueError("lz4: content size lies — quarantine")
    return bytes(out)


def lz4_frame_compress(data: bytes, block_max: int = 1 << 16) -> bytes:
    """One spec-shaped frame: content-size + content-checksum flags
    set, independent blocks; each block stored compressed unless the
    block format would expand it (then the stored-uncompressed bit)."""
    if block_max not in _BD_SIZES.values():
        raise ValueError("lz4: block_max must be a BD size")
    bd_id = {v: k for k, v in _BD_SIZES.items()}[block_max]
    flg = (1 << 6) | 0x20 | 0x08 | 0x04  # v1, independent, csize, cchecksum
    head = bytes([flg, bd_id << 4]) + struct.pack("<Q", len(data))
    hc = (xxh32(head) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _FRAME_MAGIC) + head + bytes([hc]))
    for p in range(0, len(data), block_max):
        chunk = data[p : p + block_max]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)
    out += struct.pack("<I", xxh32(data))
    return bytes(out)
