"""JSON-Lines ingestion — the interchange format LLM training corpora
actually ship as (one JSON object per line: The Pile, RedPajama, Dolma
all publish this shape).

Scale posture, encoded in ``read_jsonl``:

- EXPLICIT schema, never inference: ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types (and
  guesses unstably across shards). The schema is part of the dataset
  contract.
- JSONL is line-splittable, so unlike whole-file formats (TIFF, WARC)
  a single huge file still parallelizes by HDFS block; decode is
  JVM-side Jackson, no Python in the loop.
- ``_corrupt_record`` quarantine column instead of job failure — the
  PERMISSIVE posture for scraped corpora (count the column, don't die).

The demo fixture derives every field deterministically from the
``documents`` table (ids, text, closed-form metadata), so the DuckDB
oracle can recompute the flattened output from ``documents`` alone and
the JSON escaping/round trip is pinned by a content hash over the
round-tripped text body.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def ensure_demo_jsonl(sf_dir: str) -> str:
    """Write (idempotently) the JSONL twin of ``documents``: one line
    per doc with a nested meta struct and a tag array, every field a
    deterministic function of (doc_id, text). Returns the file path.
    One deliberately corrupt line exercises the quarantine column."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    docs = sorted(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    digest = hashlib.md5(repr((len(docs), docs[:2])).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_jsonl_demo_v1")
    path = os.path.join(root, f"docs-{digest}.jsonl")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    tmp = path + f".{os.getpid()}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        for doc_id, text in docs:
            rec = {
                "doc_id": int(doc_id),
                "text": text,
                "meta": {
                    "source": f"crawl-{int(doc_id) % 4}",
                    "n_chars": len(text),
                },
                "tags": ["even" if int(doc_id) % 2 == 0 else "odd", "demo"],
            }
            fh.write(json.dumps(rec, ensure_ascii=False) + "\n")
        fh.write("{this is not json\n")
    os.replace(tmp, path)
    return path


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced PERMISSIVE JSONL read; bad lines land whole in
    ``_corrupt_record`` with every data column NULL."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
