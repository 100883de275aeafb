"""Apache Hudi timeline reader (the PUBLIC hudi.apache.org spec).

Third of the open lakehouse table formats next to Delta
(sources/deltalog.py) and Iceberg (sources/iceberg.py). Hudi's table
state is a TIMELINE: instant files under ``.hoodie/`` named
``<17-digit instant>.<action>[.<state>]`` — a completed commit is
``<ts>.commit`` (JSON body), while ``.commit.requested`` /
``.commit.inflight`` are in-flight markers a reader must SKIP (their
presence without the completed file means an uncommitted write).
A completed commit's JSON carries ``partitionToWriteStats``:
partition -> list of per-file write stats (fileId, path, numWrites,
totalWriteBytes, ...). Copy-on-write snapshot semantics: a file group
(fileId) is replaced wholesale by a newer slice, so the live set is
the LATEST completed slice per fileId.

Scale split: only the timeline LISTING (file names) rides the driver —
O(#instants) strings. The commit bodies (the O(#files) payload) are
read by ``spark.read.json`` with an explicit schema (multiLine,
distributed), and the latest-slice resolution is a window over
fileId — no driver-side JSON walks. Actions other than ``commit`` /
``deltacommit`` (clean, rollback, compaction) are surfaced by the
timeline census and excluded from snapshot resolution, per spec.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "timeline_instants",
    "snapshot_file_slices",
    "write_commit_instant",
    "ensure_demo_hudi_table",
]

_WRITE_STATS_SCHEMA = (
    "partitionToWriteStats map<string, array<struct<"
    "fileId:string, path:string, numWrites:bigint, "
    "numUpdateWrites:bigint, totalWriteBytes:bigint>>>"
)
_INSTANT_RE = re.compile(
    r"^(\d{17})\.(commit|deltacommit|clean|rollback|compaction)"
    r"(?:\.(requested|inflight))?$"
)


def _timeline_dir(table_path: str) -> str:
    return os.path.join(table_path, ".hoodie")


def timeline_instants(table_path: str) -> list[dict]:
    """Parse the timeline listing: one row per instant file, with the
    completed/requested/inflight state split out. Unrecognized file
    names refuse — a timeline with foreign files is not a guess."""
    d = _timeline_dir(table_path)
    if not os.path.isdir(d):
        raise ValueError(f"hudi: no .hoodie timeline under {table_path}")
    out = []
    for name in sorted(os.listdir(d)):
        if name == "hoodie.properties":
            continue
        m = _INSTANT_RE.match(name)
        if not m:
            raise ValueError(f"hudi: unrecognized timeline file {name!r}")
        out.append(
            {
                "instant": m.group(1),
                "action": m.group(2),
                "state": m.group(3) or "completed",
                "path": os.path.join(d, name),
            }
        )
    return out


def write_commit_instant(
    table_path: str,
    instant: str,
    partition_stats: dict[str, list[dict]],
    action: str = "commit",
    state: str | None = None,
) -> str:
    """Fixture-grade instant writer: completed instants get the JSON
    body; requested/inflight markers are empty files per spec."""
    d = _timeline_dir(table_path)
    os.makedirs(d, exist_ok=True)
    name = f"{instant}.{action}" + (f".{state}" if state else "")
    p = os.path.join(d, name)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        if state is None:
            json.dump(
                {"partitionToWriteStats": partition_stats}, fh, sort_keys=True
            )
    os.replace(tmp, p)
    return p


def snapshot_file_slices(spark: SparkSession, table_path: str) -> DataFrame:
    """Copy-on-write snapshot: latest completed write slice per fileId.
    Returns (file_id, path, partition, instant, num_writes,
    total_write_bytes, n_slices)."""
    completed = [
        i
        for i in timeline_instants(table_path)
        if i["state"] == "completed" and i["action"] in ("commit", "deltacommit")
    ]
    if not completed:
        raise ValueError("hudi: timeline has no completed commits — quarantine")
    raw = (
        spark.read.schema(_WRITE_STATS_SCHEMA)
        .option("multiLine", "true")
        .json([i["path"] for i in completed])
        .withColumn("_file", F.input_file_name())
        .withColumn(
            "instant",
            F.regexp_extract(F.col("_file"), r"(\d{17})\.", 1),
        )
    )
    stats = (
        raw.select(
            "instant",
            F.explode("partitionToWriteStats").alias("partition", "files"),
        )
        .select("instant", "partition", F.explode("files").alias("f"))
        # flatten BEFORE windowing: both window functions must key on
        # the same attribute, not two private aliases of f.fileId, or
        # the planner pays a second exchange (plan-gated to one)
        .select(
            F.col("f.fileId").alias("file_id"),
            F.col("f.path").alias("path"),
            "partition",
            "instant",
            F.col("f.numWrites").alias("num_writes"),
            F.col("f.totalWriteBytes").alias("total_write_bytes"),
        )
    )
    w = Window.partitionBy("file_id").orderBy(F.col("instant").desc())
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        stats.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_slices", F.count(F.lit(1)).over(w_all))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ensure_demo_hudi_table(sf_dir: str, bucket: int = 25) -> str:
    """Spec-shaped demo timeline derived from ``documents`` (the same
    closed forms as the Delta/Iceberg demos): commit k+1 writes every
    bucket-k doc's base slice (numWrites = octet length, bytes = n*8,
    partition day=doc_id%7); churn docs (doc_id%9==8) get a REPLACING
    copy-on-write slice at instant k+3 (bytes = n*9 — the update is
    distinguishable). One clean instant plus one requested and one
    inflight marker are planted so state/action filtering is
    exercised, not assumed."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    digest = hashlib.md5(
        repr((len(docs), docs[:2], bucket)).encode()
    ).hexdigest()[:12]
    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_hudi_demo_v1", f"t-{digest}"
    )
    done = root + ".done"
    if os.path.exists(done):
        return root

    def ts(v: int) -> str:
        return f"{20240101000000000 + v:017d}"

    def stat(d: int, n: int, v: int) -> dict:
        return {
            "fileId": f"f-{d:09d}",
            "path": f"day={d % 7}/f-{d:09d}_0_{ts(v)}.parquet",
            "numWrites": n,
            "numUpdateWrites": 0 if v == d // bucket + 1 else n,
            "totalWriteBytes": n * 8 if v == d // bucket + 1 else n * 9,
        }

    base: dict[int, dict[str, list[dict]]] = {}
    upd: dict[int, dict[str, list[dict]]] = {}
    for doc_id, text in docs:
        d = int(doc_id)
        n = len(str(text).encode("utf-8"))
        k = d // bucket
        base.setdefault(k + 1, {}).setdefault(f"day={d % 7}", []).append(
            stat(d, n, k + 1)
        )
        if d % 9 == 8:
            upd.setdefault(k + 3, {}).setdefault(f"day={d % 7}", []).append(
                stat(d, n, k + 3)
            )
    n_buckets = (len(docs) + bucket - 1) // bucket
    for v in range(1, n_buckets + 3):
        stats = base.get(v, {})
        ustats = upd.get(v)
        if stats:
            write_commit_instant(root, ts(v), stats)
        if ustats:
            # updates land on their own instant; when a base commit
            # already occupies ts(v), shift the update half a tick
            # later (still strictly after every base slice it replaces)
            inst = f"{int(ts(v)) + 500:017d}" if stats else ts(v)
            write_commit_instant(root, inst, ustats)
    # planted non-snapshot instants: filtering is tested, not assumed
    write_commit_instant(root, ts(900), {}, action="clean")
    write_commit_instant(root, ts(901), {}, state="requested")
    write_commit_instant(root, ts(902), {}, state="inflight")
    with open(os.path.join(_timeline_dir(root), "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.name=demo\nhoodie.table.type=COPY_ON_WRITE\n")
    with open(done, "w") as fh:
        fh.write("ok\n")
    return root
