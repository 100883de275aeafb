"""Git LFS pointer files (the PUBLIC git-lfs spec/v1 format).

Cloned code/model repositories — the Hugging Face hub above all —
store big artifacts as LFS POINTERS: a sub-kilobyte UTF-8 text file

    version https://git-lfs.github.com/spec/v1
    oid sha256:<64 hex>
    size <decimal>

A corpus intake that treats a pointer as the artifact trains on 130
bytes of metadata instead of the model/dataset blob, so the audit
must classify every small text file: real pointer (surface oid+size
so the fetch layer can resolve it) vs ordinary source file. The spec
is strict and so is this parser: first line must be the version key,
keys afterward in alphabetical order, single space separator, LF
endings, oid must be ``sha256:`` + 64 lowercase hex, size a
non-negative decimal, total file under 1024 bytes. Violations raise
ValueError — a almost-pointer is more suspicious than a non-pointer,
and the census counts it as malformed rather than guessing.
"""

from __future__ import annotations

import re

__all__ = ["is_probably_pointer", "parse_lfs_pointer", "build_lfs_pointer"]

_VERSION = "https://git-lfs.github.com/spec/v1"
_OID_RE = re.compile(r"^sha256:[0-9a-f]{64}$")


def is_probably_pointer(blob: bytes) -> bool:
    """Cheap pre-filter (the spec's own recommendation): small file
    whose first bytes are the version line."""
    return len(blob) < 1024 and blob.startswith(b"version " + _VERSION.encode())


def parse_lfs_pointer(blob: bytes) -> dict:
    if len(blob) >= 1024:
        raise ValueError("lfs: pointer file must be under 1024 bytes")
    try:
        text = blob.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"lfs: not UTF-8 — quarantine ({e})") from e
    if "\r" in text:
        raise ValueError("lfs: CRLF endings — spec requires LF — quarantine")
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    kv: dict[str, str] = {}
    keys: list[str] = []
    for ln in lines:
        k, sep, v = ln.partition(" ")
        if not sep or not k or not v:
            raise ValueError(f"lfs: malformed line {ln!r} — quarantine")
        if k in kv:
            raise ValueError(f"lfs: duplicate key {k!r} — quarantine")
        kv[k] = v
        keys.append(k)
    if not keys or keys[0] != "version" or kv["version"] != _VERSION:
        raise ValueError("lfs: missing/invalid version line — quarantine")
    if keys[1:] != sorted(keys[1:]):
        raise ValueError("lfs: keys not in alphabetical order — quarantine")
    oid = kv.get("oid", "")
    if not _OID_RE.match(oid):
        raise ValueError(f"lfs: invalid oid {oid!r} — quarantine")
    size = kv.get("size", "")
    if not size.isdigit():
        raise ValueError(f"lfs: invalid size {size!r} — quarantine")
    return {
        "oid": oid.split(":", 1)[1],
        "size": int(size),
        "extra_keys": [k for k in keys if k not in ("version", "oid", "size")],
    }


def build_lfs_pointer(oid_hex: str, size: int, extra: dict | None = None) -> bytes:
    body = {"oid": f"sha256:{oid_hex}", "size": str(size), **(extra or {})}
    lines = [f"version {_VERSION}"] + [
        f"{k} {body[k]}" for k in sorted(body)
    ]
    return ("\n".join(lines) + "\n").encode("utf-8")
