"""WARC (Web ARChive, ISO 28500) reader/writer — web-corpus ingestion.

The entry format of a CommonCrawl-style LLM training-data pipeline; the
reference has no counterpart (beyond-reference LLM mandate, like the
TIFF/PNG/BMP/GIF/WAV/AVI codecs in this package). Pure-python codec:

- WARC/1.0 records: a CRLF header block (``WARC/1.0`` version line +
  ``Name: value`` headers including ``Content-Length``), a blank line,
  ``Content-Length`` payload bytes, then a blank-line record separator.
- ``.warc.gz`` uses the CommonCrawl convention of one gzip MEMBER per
  record (members concatenated back-to-back), which is what makes the
  format seekable/splittable in index-based readers; the decoder walks
  members with a fresh zlib stream each time and the tests pin that
  each member is independently decompressible.

Spark side mirrors ``read_geotiff_long``: ``binaryFile`` (one task per
archive — archives never split, a crawl directory parallelizes by
file) + ``mapInPandas`` streaming bounded Arrow batches. At 100 TB a
crawl is millions of ~1 GiB .warc.gz files, so file-granular
parallelism is the natural unit and no task ever materializes more
than ``batch_rows`` records.
"""

from __future__ import annotations

import gzip
import os
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "encode_warc",
    "decode_warc",
    "read_warc",
    "ensure_demo_warc",
    "DEMO_WARC_FILES",
    "DEMO_WARC_RECORDS",
]

_CRLF = b"\r\n"


def _encode_record(rec: dict) -> bytes:
    payload = rec["payload"]
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    headers = [
        ("WARC-Type", rec.get("type", "response")),
        ("WARC-Target-URI", rec.get("target_uri", "")),
        ("WARC-Date", rec.get("date", "")),
        ("WARC-Record-ID", rec.get("record_id", "<urn:uuid:0>")),
        ("Content-Type", rec.get("content_type", "text/plain")),
        ("Content-Length", str(len(payload))),
    ]
    head = b"WARC/1.0" + _CRLF
    head += b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers if v != ""
    )
    return head + _CRLF + payload + _CRLF + _CRLF


def encode_warc(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize records to WARC bytes; ``per_record_gzip=True`` writes
    the CommonCrawl one-gzip-member-per-record form."""
    if per_record_gzip:
        # mtime pinned so the archive bytes are a pure function of the
        # records (gzip headers embed a timestamp otherwise)
        return b"".join(
            gzip.compress(_encode_record(r), mtime=0) for r in records
        )
    return b"".join(_encode_record(r) for r in records)


_GZ_CHUNK = 1 << 16


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    # Feed fixed-size chunks, not the whole remaining tail: a real crawl
    # archive holds tens of thousands of members, and handing zlib
    # `data[pos:]` per member copies the tail each time — O(n^2) bytes.
    # Chunked feeding keeps the walk linear; memoryview slices are free.
    view = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = []
        p = pos
        while not d.eof and p < n:
            chunk = view[p : p + _GZ_CHUNK]
            out.append(d.decompress(chunk))
            p += len(chunk)
        if not d.eof:
            raise ValueError(f"corrupt/truncated gzip member at offset {pos}")
        yield b"".join(out)
        consumed = (p - pos) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at offset {pos} consumed no bytes")
        pos += consumed


def _parse_records(data: bytes) -> Iterator[dict]:
    pos = 0
    while pos < len(data):
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at offset {pos}")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        lines = data[pos:head_end].split(_CRLF)
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(
                f"missing/invalid Content-Length at offset {pos}"
            ) from e
        body_start = head_end + 4
        if body_start + n > len(data):
            raise ValueError(
                f"truncated WARC record at offset {pos}: "
                f"payload needs {n} bytes, {len(data) - body_start} left"
            )
        yield {
            "type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "content_length": n,
            "payload": data[body_start : body_start + n],
        }
        pos = body_start + n


def decode_warc(data: bytes) -> list[dict]:
    """Parse a .warc or per-record-gzip .warc.gz byte string."""
    if data[:2] == b"\x1f\x8b":
        out: list[dict] = []
        for member in _split_gzip_members(data):
            out.extend(_parse_records(member))
        return out
    return list(_parse_records(data))


def read_warc(
    spark: SparkSession,
    path: str,
    batch_rows: int = 1 << 14,
    on_error: str = "fail",
) -> DataFrame:
    """Read WARC archive(s) as a table ``(archive, record_idx, warc_type,
    target_uri, warc_date, content_length, payload)``.

    ``path`` may be a file, directory, or glob (anything ``binaryFile``
    accepts). One parse task per archive; records stream out in
    ``batch_rows``-sized Arrow batches. ``on_error='skip'`` drops
    undecodable archives (the bulk-backfill posture); the default fails
    with the path in the message.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(p)
                try:
                    recs = decode_warc(bytes(content))
                except Exception as e:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"undecodable WARC {p}: {e}") from e
                for s in range(0, len(recs), batch_rows):
                    chunk = recs[s : s + batch_rows]
                    yield pd.DataFrame(
                        {
                            "archive": name,
                            "record_idx": range(s, s + len(chunk)),
                            "warc_type": [r["type"] for r in chunk],
                            "target_uri": [r["target_uri"] for r in chunk],
                            "warc_date": [r["date"] for r in chunk],
                            "content_length": [
                                r["content_length"] for r in chunk
                            ],
                            "payload": [
                                r["payload"].decode("utf-8", "replace")
                                for r in chunk
                            ],
                        }
                    )

    schema = (
        "archive string, record_idx long, warc_type string, "
        "target_uri string, warc_date string, content_length long, "
        "payload string"
    )
    # Extension filter: a directory load must never pick up an orphaned
    # temp file from a crashed writer (e.g. a stray "<name>.warc.tmp") —
    # with on_error='fail' that would poison every query over the dir.
    # pathGlobFilter applies to file names only, so explicit file paths
    # and user globs still work; dot-/underscore-prefixed files are
    # hidden to Spark's file index regardless.
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .load(path)
    )
    return df.select("path", "content").mapInPandas(parse, schema=schema)


# ---------------------------------------------------------------------------
# Deterministic demo crawl — closed-form like the GeoTIFF demo corpus,
# so the registry query's oracle can regenerate the expected aggregates
# from SQL generators without any table dependency. Record seed
# f*RECORDS+r fixes url/date/payload exactly; file 2 is per-record-gzip.
# ---------------------------------------------------------------------------
DEMO_WARC_FILES = 3
DEMO_WARC_RECORDS = 40


def demo_warc_record(f: int, r: int) -> dict:
    seed = f * DEMO_WARC_RECORDS + r
    # payloads repeat with period 60: records 60..119 duplicate 0..59
    # exactly, giving the dedup stage of the curation funnel real work
    eff = seed % 60
    n_toks = 5 + eff % 25
    payload = " ".join(f"w{(eff * 13 + j) % 53}" for j in range(n_toks))
    return {
        "type": "response",
        "target_uri": f"https://site-{seed % 7}.example.com/doc/{f}/{r}",
        "date": f"2024-05-{1 + seed % 10:02d}T00:00:00Z",
        "record_id": f"<urn:demo:{seed}>",
        "payload": payload,
    }


def ensure_demo_warc(base_dir: str | None = None) -> str:
    """Write (idempotently) the demo crawl; returns its directory.

    The default directory name embeds a hash of the generator's own
    output, so editing demo_warc_record or the DEMO_* constants
    automatically busts the /tmp cache instead of silently serving
    stale archive bytes to the oracle-checked queries."""
    import hashlib
    import tempfile

    tag = hashlib.md5(
        _encode_record(demo_warc_record(0, DEMO_WARC_RECORDS - 1))
        + f"{DEMO_WARC_FILES}x{DEMO_WARC_RECORDS}".encode()
    ).hexdigest()[:10]
    root = base_dir or os.path.join(
        tempfile.gettempdir(), f"spark_graft_warc_demo_{tag}"
    )
    os.makedirs(root, exist_ok=True)
    for f in range(DEMO_WARC_FILES):
        gz = f == DEMO_WARC_FILES - 1
        name = f"crawl-{f:02d}.warc" + (".gz" if gz else "")
        path = os.path.join(root, name)
        if os.path.exists(path):
            continue
        recs = [demo_warc_record(f, r) for r in range(DEMO_WARC_RECORDS)]
        blob = encode_warc(recs, per_record_gzip=gz)
        # Unique temp name: a writer that dies mid-write must not leave a
        # predictable "<path>.tmp" that a concurrent writer collides with.
        # Dot-prefixed = hidden to Spark's file index, so a torn write can
        # never be picked up by a directory load (ADVICE r4 #4); read_warc's
        # pathGlobFilter additionally screens non-hidden strays.
        fd, tmp = tempfile.mkstemp(
            prefix="." + name + ".", suffix=".part", dir=root
        )
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return root
