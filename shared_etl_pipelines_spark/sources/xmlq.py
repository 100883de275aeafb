"""XML ingestion with malformed-record quarantine — the markup twin of
sources/jsonl.py / sources/csvq.py for corpora that ship as XML (sitemap
dumps, metadata feeds, MediaWiki-style exports).

Spark 4 ships the (donated) spark-xml source natively: ``rowTag``
record extraction is a JVM-side StAX scan, files split by block with
the scanner resynchronizing on the next row tag, so a large dump
parallelizes like JSONL — no Python in the loop.

Scale posture, encoded in ``read_xml_quarantine``:

- EXPLICIT schema, never inference (a second full pass over 100 TB
  that guesses element-vs-array unstably across shards).
- PERMISSIVE + ``_corrupt_record``: a record with an UNTYPEABLE leaf
  cell (text where the schema says long) quarantines whole — the StAX
  walk keeps every top-level field parsed BEFORE the failure
  (attributes, earlier siblings) and nulls the rest — and the scanner
  recovers at the next record. ``_corrupt_record IS NOT NULL`` is the
  quarantine signal; its content is raw text and is never aggregated.
- BROKEN MARKUP is different: XML cannot be resynchronized after an
  unbalanced tag, so an unclosed element quarantines the REST OF THE
  FILE as one corrupt record (records before the break parse
  normally). That whole-file failure domain is the format's nature,
  not a reader bug — it is pinned in tests (``write_structural_break_
  xml`` below builds the fixture) and is why crawl pipelines shard XML
  dumps into many small files before ingest.
- Attributes surface under the default ``_`` prefix (``_id``,
  ``_lang``); repeated sibling elements surface as arrays — the two
  XML-specific mappings the explicit schema locks down.

The demo fixture derives every row from ``documents`` (plus planted
bad records), so a DuckDB oracle recomputes the good/quarantined split
and all aggregates from ``documents`` alone.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

XML_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("_lang", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("tag", T.ArrayType(T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# Planted failure class, mirrored in the oracle: untypeable n_chars
# cell when doc_id % 41 == 0 (recoverable per-record quarantine).
UNTYPEABLE_MOD = 41

_DOCS_PER_FILE = 256


def _doc_xml(doc_id: int, text: str) -> str:
    d = int(doc_id)
    src = f"crawl-{d % 4}"
    lang = f"l{d % 4}"
    score = (d % 100) / 10.0
    tags = "".join(f"<tag>t{(d + i) % 5}</tag>" for i in range(d % 3))
    if d % UNTYPEABLE_MOD == 0:
        # untypeable n_chars: fields parsed BEFORE the failure (_id,
        # source) survive; meta and the later tag siblings null
        return (
            f'<doc id="{d}"><source>{src}</source>'
            f'<meta lang="{lang}"><n_chars>x{len(text)}</n_chars>'
            f"<score>{score}</score></meta>{tags}</doc>"
        )
    return (
        f'<doc id="{d}"><source>{src}</source>'
        f'<meta lang="{lang}"><n_chars>{len(text)}</n_chars>'
        f"<score>{score}</score></meta>{tags}</doc>"
    )


def ensure_demo_xml(sf_dir: str) -> str:
    """Write (idempotently) the XML twin of ``documents``: one ``<doc>``
    record per row, every value a deterministic function of doc_id,
    sharded into ~256-record files so the read parallelizes. Returns
    the directory path."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    digest = hashlib.md5(repr((len(docs), docs[:2])).encode()).hexdigest()[:12]
    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_xml_demo_v2", f"docs-{digest}"
    )
    done = root + ".done"
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    for start in range(0, len(docs), _DOCS_PER_FILE):
        chunk = docs[start : start + _DOCS_PER_FILE]
        tmp = os.path.join(root, f"part-{start:08d}.xml.{os.getpid()}.tmp")
        with open(tmp, "w", encoding="utf-8", newline="\n") as fh:
            fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<docs>\n')
            for doc_id, text in chunk:
                fh.write(_doc_xml(doc_id, text) + "\n")
            fh.write("</docs>\n")
        os.replace(tmp, os.path.join(root, f"part-{start:08d}.xml"))
    with open(done, "w") as fh:
        fh.write("ok")
    return root


def write_structural_break_xml(path: str, n_docs: int = 12, break_at: int = 5) -> None:
    """Test fixture for the whole-file failure domain: one file whose
    record ``break_at`` has an unclosed ``<meta>``. Records before the
    break parse normally; the break record AND everything after it land
    in ONE corrupt record (XML cannot resynchronize past broken
    markup)."""
    with open(path, "w", encoding="utf-8", newline="\n") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<docs>\n')
        # ids start at 1 so none hits the UNTYPEABLE_MOD plant
        for d in range(1, n_docs + 1):
            if d == break_at:
                fh.write(
                    f'<doc id="{d}"><source>crawl-{d % 4}</source>'
                    f'<meta lang="l{d % 4}"><n_chars>{d * 10}</n_chars>'
                    f"<score>{(d % 100) / 10.0}</score></doc>\n"
                )
            else:
                fh.write(_doc_xml(d, "x" * (d * 10)) + "\n")
        fh.write("</docs>\n")


def read_xml_quarantine(
    spark: SparkSession, path: str, schema: T.StructType = XML_SCHEMA
) -> DataFrame:
    """Schema-enforced PERMISSIVE XML read over ``rowTag=doc`` records;
    bad records land in ``_corrupt_record`` (see module docstring for
    the two failure shapes)."""
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", "doc")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .load(path)
    )
