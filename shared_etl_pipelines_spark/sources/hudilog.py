"""Apache Hudi log-file format (the PUBLIC hudi.apache.org tech spec,
"Log File Format" — the merge-on-read side of sources/hudi.py).

A MERGE_ON_READ file group is a base parquet file plus an ordered
chain of ``.log`` files written by deltacommits; readers merge the
latest record version per record key and drop deleted keys. Each log
file is a sequence of blocks:

    #HUDI# (6-byte magic)
    block length        : int64 BE (everything from magic to the
                          trailing total-length, inclusive)
    format version      : int32 BE (1)
    block type          : int32 BE (1 COMMAND / 2 DELETE / 3 CORRUPT /
                          4 AVRO_DATA — the tech-spec ordinals)
    header map          : int32 count, then per entry
                          int32 key ordinal (1 = INSTANT_TIME,
                          2 = TARGET_INSTANT, 3 = SCHEMA),
                          int32 length + utf-8 value
    content length      : int64 BE
    content             : <content length> bytes
    footer map          : same encoding as the header
    total block length  : int64 BE (enables reverse traversal)

AVRO_DATA content: int32 format version, int32 record count, then per
record int32 size + Avro binary body (writer schema rides the SCHEMA
header as JSON — decoded by the repo's own sources/avro.py binary
layer). DELETE content: int32 format version, int32 key count, then
per key int32 length + utf-8 record key.

Truncated or magic-less bytes refuse with ValueError: an unreadable
log block means the file slice cannot be trusted, and the repo's
convention is loud quarantine over silent row loss.
"""

from __future__ import annotations

import json
import struct

from shared_etl_pipelines_spark.sources.avro import _decode, _encode, _Reader

__all__ = ["write_log_file", "read_log_blocks", "BLOCK_AVRO", "BLOCK_DELETE"]

_MAGIC = b"#HUDI#"
BLOCK_COMMAND = 1
BLOCK_DELETE = 2
BLOCK_CORRUPT = 3
BLOCK_AVRO = 4
H_INSTANT_TIME = 1
H_TARGET_INSTANT = 2
H_SCHEMA = 3


def _enc_map(m: dict[int, str]) -> bytes:
    out = [struct.pack(">i", len(m))]
    for k, v in sorted(m.items()):
        vb = v.encode("utf-8")
        out.append(struct.pack(">i", k))
        out.append(struct.pack(">i", len(vb)))
        out.append(vb)
    return b"".join(out)


def _dec_map(buf: bytes, p: int) -> tuple[dict[int, str], int]:
    (n,) = struct.unpack_from(">i", buf, p)
    p += 4
    out = {}
    for _ in range(n):
        k, ln = struct.unpack_from(">ii", buf, p)
        p += 8
        out[k] = buf[p : p + ln].decode("utf-8")
        p += ln
    return out, p


def _block(btype: int, headers: dict[int, str], content: bytes) -> bytes:
    hdr = _enc_map(headers)
    ftr = _enc_map({})
    # block length counts magic..total-length inclusive
    body_len = 6 + 8 + 4 + 4 + len(hdr) + 8 + len(content) + len(ftr) + 8
    return b"".join(
        (
            _MAGIC,
            struct.pack(">q", body_len),
            struct.pack(">i", 1),
            struct.pack(">i", btype),
            hdr,
            struct.pack(">q", len(content)),
            content,
            ftr,
            struct.pack(">q", body_len),
        )
    )


def write_log_file(
    path: str,
    instant: str,
    avro_schema: dict | None = None,
    records: list[dict] | None = None,
    delete_keys: list[str] | None = None,
) -> str:
    """One log file holding an AVRO_DATA block (when ``records``) and/or
    a DELETE block (when ``delete_keys``), stamped with the instant."""
    blocks = []
    if records:
        if avro_schema is None:
            raise ValueError("hudilog: records need an avro schema")
        recs = []
        for r in records:
            body = _encode(r, avro_schema)
            recs.append(struct.pack(">i", len(body)) + body)
        content = struct.pack(">ii", 1, len(records)) + b"".join(recs)
        blocks.append(
            _block(
                BLOCK_AVRO,
                {H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(avro_schema)},
                content,
            )
        )
    if delete_keys:
        keys = b"".join(
            struct.pack(">i", len(k.encode())) + k.encode() for k in delete_keys
        )
        content = struct.pack(">ii", 1, len(delete_keys)) + keys
        blocks.append(_block(BLOCK_DELETE, {H_INSTANT_TIME: instant}, content))
    if not blocks:
        raise ValueError("hudilog: nothing to write")
    with open(path, "wb") as fh:
        for b in blocks:
            fh.write(b)
    return path


def read_log_blocks(blob: bytes) -> list[dict]:
    """Parse every block of a log file. Returns dicts with keys
    ``type``, ``instant``, and either ``records`` (AVRO_DATA, decoded
    via the SCHEMA header) or ``keys`` (DELETE)."""
    out = []
    p = 0
    while p < len(blob):
        if blob[p : p + 6] != _MAGIC:
            raise ValueError("hudilog: bad magic — quarantine")
        (blen,) = struct.unpack_from(">q", blob, p + 6)
        if p + blen > len(blob):
            raise ValueError("hudilog: truncated block — quarantine")
        (tail,) = struct.unpack_from(">q", blob, p + blen - 8)
        if tail != blen:
            raise ValueError("hudilog: length mismatch — quarantine")
        q = p + 14
        ver, btype = struct.unpack_from(">ii", blob, q)
        q += 8
        if ver != 1:
            raise ValueError(f"hudilog: unsupported version {ver}")
        headers, q = _dec_map(blob, q)
        (clen,) = struct.unpack_from(">q", blob, q)
        q += 8
        content = blob[q : q + clen]
        instant = headers.get(H_INSTANT_TIME, "")
        rec: dict = {"type": btype, "instant": instant}
        if btype == BLOCK_AVRO:
            schema = json.loads(headers[H_SCHEMA])
            fmt, n = struct.unpack_from(">ii", content, 0)
            cp = 8
            recs = []
            for _ in range(n):
                (sz,) = struct.unpack_from(">i", content, cp)
                cp += 4
                recs.append(_decode(_Reader(content[cp : cp + sz]), schema))
                cp += sz
            rec["records"] = recs
        elif btype == BLOCK_DELETE:
            fmt, n = struct.unpack_from(">ii", content, 0)
            cp = 8
            keys = []
            for _ in range(n):
                (sz,) = struct.unpack_from(">i", content, cp)
                cp += 4
                keys.append(content[cp : cp + sz].decode("utf-8"))
                cp += sz
            rec["keys"] = keys
        out.append(rec)
        p += blen
    return out
