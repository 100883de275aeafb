"""CSV ingestion with malformed-row quarantine — the delimited twin of
sources/jsonl.py for corpora that ship as CSV/TSV exports (metadata
sidecars, label tables, crawl indexes).

Scale posture, encoded in ``read_csv_quarantine``:

- EXPLICIT schema, never ``inferSchema`` (a second full pass over
  100 TB that guesses unstably across shards).
- PERMISSIVE + ``_corrupt_record``: a malformed line (wrong arity,
  untypeable cell, stray quote) lands whole in the quarantine column
  with data columns NULL — count it, don't die. FAILFAST is one option
  away for contract-critical feeds.
- ``multiLine`` stays OFF: with it off a file splits by block and
  parallelizes like JSONL; quoted embedded newlines are the one shape
  that genuinely requires whole-file parsing (same trade as WARC).
- JVM-side Univocity parser — no Python in the loop.

The demo fixture derives every row from ``documents`` (plus planted
malformed lines), so a DuckDB oracle recomputes the good/quarantined
split and all aggregates from ``documents`` alone.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def ensure_demo_csv(sf_dir: str) -> str:
    """Write (idempotently) the CSV twin of ``documents``: one row per
    doc with quoted text-derived fields, every value a deterministic
    function of doc_id. Rows where doc_id % 37 == 0 are MALFORMED (an
    untypeable doc_id cell) and must quarantine. Returns the path."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    digest = hashlib.md5(repr((len(docs), docs[:2])).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_csv_demo_v1")
    path = os.path.join(root, f"docs-{digest}.csv")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    tmp = path + f".{os.getpid()}.tmp"
    with open(tmp, "w", encoding="utf-8", newline="\n") as fh:
        fh.write("doc_id,source,n_chars,score\n")
        for doc_id, text in docs:
            d = int(doc_id)
            if d % 37 == 0:
                # untypeable doc_id cell -> PERMISSIVE quarantine
                fh.write(f"id-{d},crawl-{d % 4},{len(text)},{(d % 100) / 10.0}\n")
            else:
                fh.write(f"{d},crawl-{d % 4},{len(text)},{(d % 100) / 10.0}\n")
    os.replace(tmp, path)
    return path


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: T.StructType = CSV_SCHEMA
) -> DataFrame:
    """Schema-enforced PERMISSIVE CSV read; malformed lines land whole
    in ``_corrupt_record`` with every data column NULL."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
