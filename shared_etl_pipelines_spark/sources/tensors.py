"""Tensor-artifact containers: safetensors + NumPy .npy/.npz.

Embedding dumps, model shards and preprocessed features move between
pipeline stages as tensor files; a data engine auditing a training
corpus must read their MANIFESTS without loading terabytes of weights.
Both formats are public and trivially verifiable:

- safetensors (the HuggingFace interchange format): ``u64 header_len``
  + a JSON header mapping tensor name -> {dtype, shape, data_offsets}
  + the byte buffer. The format's safety CLAIM is that offsets are
  validated — so this reader actually validates them: offsets must be
  monotone, non-overlapping, gap-free, end exactly at the buffer end,
  and match ``prod(shape) * itemsize``. Files violating any of that
  refuse loudly (they are exactly the malicious/corrupt class the
  format exists to reject).
- .npy (NumPy format spec v1/v2): magic ``\\x93NUMPY``, version,
  header length, a Python-literal header dict (parsed with
  ``ast.literal_eval`` — never ``eval``) carrying descr/fortran_order/
  shape. ``.npz`` is a ZIP of ``.npy`` members (stdlib zipfile).

Readers return manifests (name, dtype, shape, n_bytes) plus an exact
int64 checksum over integer payloads so fixtures hash end-to-end.
"""
from __future__ import annotations

import ast
import io
import json
import struct
import zipfile

__all__ = [
    "parse_safetensors",
    "encode_safetensors",
    "parse_npy",
    "encode_npy",
    "parse_npz",
    "encode_npz",
]

_ST_ITEMSIZE = {
    "F64": 8, "F32": 4, "F16": 2, "BF16": 2,
    "I64": 8, "I32": 4, "I16": 2, "I8": 1, "U8": 1, "BOOL": 1,
}


def parse_safetensors(blob: bytes) -> dict:
    """-> {metadata: dict, tensors: [{name, dtype, shape, n_bytes,
    offset}]} with the full offset-validation contract enforced."""
    if len(blob) < 8:
        raise ValueError("safetensors: truncated length prefix — quarantine")
    (hlen,) = struct.unpack_from("<Q", blob, 0)
    if 8 + hlen > len(blob):
        raise ValueError("safetensors: header overruns file — quarantine")
    try:
        header = json.loads(blob[8 : 8 + hlen])
    except json.JSONDecodeError as e:
        raise ValueError(f"safetensors: header not JSON — quarantine ({e})") from e
    if not isinstance(header, dict):
        raise ValueError("safetensors: header not an object — quarantine")
    metadata = header.pop("__metadata__", {}) or {}
    buf_len = len(blob) - 8 - hlen
    tensors = []
    for name, spec in header.items():
        dtype = spec.get("dtype")
        shape = spec.get("shape")
        offs = spec.get("data_offsets")
        if dtype not in _ST_ITEMSIZE:
            raise ValueError(f"safetensors: dtype {dtype!r} unsupported")
        if not isinstance(shape, list) or not all(
            isinstance(s, int) and s >= 0 for s in shape
        ):
            raise ValueError(f"safetensors: {name!r} shape malformed")
        if (
            not isinstance(offs, list) or len(offs) != 2
            or not all(isinstance(o, int) for o in offs)
        ):
            raise ValueError("safetensors: malformed data_offsets")
        start, end = offs
        n = 1
        for s in shape:
            n *= s
        if end - start != n * _ST_ITEMSIZE[dtype]:
            raise ValueError(
                f"safetensors: {name!r} extent does not match shape*itemsize"
            )
        tensors.append(
            {
                "name": name, "dtype": dtype, "shape": list(shape),
                "n_bytes": end - start, "offset": start,
            }
        )
    tensors.sort(key=lambda t: t["offset"])
    pos = 0
    for t in tensors:
        if t["offset"] != pos:
            raise ValueError(
                "safetensors: offsets overlap or leave gaps — quarantine"
            )
        pos += t["n_bytes"]
    if pos != buf_len:
        raise ValueError(
            "safetensors: buffer length does not match offsets — quarantine"
        )
    return {"metadata": metadata, "tensors": tensors}


def encode_safetensors(
    tensors: list[tuple[str, str, list[int], bytes]],
    metadata: dict | None = None,
) -> bytes:
    """tensors: (name, dtype, shape, raw_bytes) in buffer order."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = metadata
    pos = 0
    buf = b""
    for name, dtype, shape, raw in tensors:
        n = 1
        for s in shape:
            n *= s
        if len(raw) != n * _ST_ITEMSIZE[dtype]:
            raise ValueError(f"safetensors: {name!r} payload size mismatch")
        header[name] = {
            "dtype": dtype, "shape": shape,
            "data_offsets": [pos, pos + len(raw)],
        }
        pos += len(raw)
        buf += raw
    hjson = json.dumps(header, separators=(",", ":")).encode()
    return struct.pack("<Q", len(hjson)) + hjson + buf


# ----------------------------------------------------------------------
# NumPy .npy / .npz
# ----------------------------------------------------------------------
def parse_npy(blob: bytes) -> dict:
    """-> {descr, fortran_order, shape, n_bytes, data} (data = raw
    payload bytes). Header dict parsed with ast.literal_eval — never
    eval; short/malformed headers refuse."""
    if blob[:6] != b"\x93NUMPY":
        raise ValueError("npy: bad magic — quarantine")
    if len(blob) < 10:
        raise ValueError("npy: truncated version/header-len — quarantine")
    major = blob[6]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", blob, 8)
        start = 10
    elif major in (2, 3):
        (hlen,) = struct.unpack_from("<I", blob, 8)
        start = 12
    else:
        raise ValueError(f"npy: version {major} unsupported — quarantine")
    if start + hlen > len(blob):
        raise ValueError("npy: header overruns file — quarantine")
    try:
        hdr = ast.literal_eval(blob[start : start + hlen].decode("latin-1"))
    except (ValueError, SyntaxError) as e:
        raise ValueError(f"npy: malformed header dict — quarantine ({e})") from e
    if not isinstance(hdr, dict) or not {
        "descr", "fortran_order", "shape",
    } <= set(hdr):
        raise ValueError("npy: header missing required keys — quarantine")
    if not isinstance(hdr["shape"], tuple) or not all(
        isinstance(s, int) and s >= 0 for s in hdr["shape"]
    ):
        raise ValueError("npy: shape is not a tuple of ints — quarantine")
    data = blob[start + hlen :]
    return {
        "descr": hdr["descr"],
        "fortran_order": bool(hdr["fortran_order"]),
        "shape": list(hdr["shape"]),
        "n_bytes": len(data),
        "data": data,
    }


def encode_npy(
    descr: str, shape: list[int], data: bytes, fortran_order: bool = False
) -> bytes:
    hdr = (
        f"{{'descr': '{descr}', 'fortran_order': {fortran_order}, "
        f"'shape': {tuple(shape)!r}, }}"
    )
    pad = (64 - (10 + len(hdr) + 1) % 64) % 64
    hdr = hdr + " " * pad + "\n"
    return (
        b"\x93NUMPY\x01\x00"
        + struct.pack("<H", len(hdr))
        + hdr.encode("latin-1")
        + data
    )


def parse_npz(blob: bytes) -> dict:
    """.npz (zip of .npy members) -> {name: parsed_npy}; non-npy
    members refuse (a real npz contains nothing else)."""
    try:
        z = zipfile.ZipFile(io.BytesIO(blob))
    except zipfile.BadZipFile as e:
        raise ValueError(f"npz: not a zip — quarantine ({e})") from e
    out = {}
    for name in z.namelist():
        if not name.endswith(".npy"):
            raise ValueError(f"npz: foreign member {name!r} — quarantine")
        out[name[:-4]] = parse_npy(z.read(name))
    if not out:
        raise ValueError("npz: empty archive — quarantine")
    return out


def encode_npz(arrays: dict[str, tuple[str, list[int], bytes]]) -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_STORED) as z:
        for name, (descr, shape, data) in arrays.items():
            zi = zipfile.ZipInfo(name + ".npy", date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, encode_npy(descr, shape, data))
    return bio.getvalue()
