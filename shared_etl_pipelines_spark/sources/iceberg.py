"""Apache Iceberg snapshot reader (the PUBLIC iceberg.apache.org spec).

The other open lakehouse table format next to Delta (sources/
deltalog.py): table state lives in ``metadata/vN.metadata.json``
(snapshots, current-snapshot-id), each snapshot points at a MANIFEST
LIST (Avro OCF — decoded by the repo's own sources/avro.py), and each
manifest list entry points at a MANIFEST (Avro again) whose entries
carry per-data-file status (0 EXISTING / 1 ADDED / 2 DELETED) plus the
file stats. This module implements that read path with the scale
split every Iceberg reader uses:

- driver side: ONLY the metadata JSON and the manifest list (one small
  Avro file per snapshot — O(#manifests) entries);
- executor side: the manifests themselves (the O(#files) payload)
  decode inside mapInPandas, one task batch per manifest slice — at
  100 TB a snapshot has thousands of manifests and millions of files,
  and none of that touches the driver.

Schema subset: the audit fields of manifest_entry / manifest_file
(spec tables 100-102); column-level stats maps and delete files are
out of scope and the schemas say so. Structural lies (missing
snapshot, unreadable manifest) refuse loudly via the Avro layer's
quarantine ValueErrors.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.sources.avro import (
    read_avro_ocf,
    write_avro_ocf,
)

__all__ = [
    "read_table_metadata",
    "snapshot_files",
    "manifest_churn",
    "expire_snapshots_plan",
    "ensure_demo_iceberg_table",
]

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": "long"},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {"type": "map", "values": "string"}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}


def read_table_metadata(table_path: str) -> dict:
    """Newest ``metadata/vN.metadata.json`` (the version-file contract)."""
    cands = _glob.glob(os.path.join(table_path, "metadata", "v*.metadata.json"))
    if not cands:
        raise ValueError(f"iceberg: no metadata json under {table_path}")
    newest = max(
        cands, key=lambda p: int(re.search(r"v(\d+)\.metadata", p).group(1))
    )
    with open(newest) as fh:
        return json.load(fh)


def _pick_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    for s in meta.get("snapshots", []):
        if s["snapshot-id"] == sid:
            return s
    raise ValueError(f"iceberg: snapshot {sid} not in metadata — quarantine")


def _manifest_list(snapshot: dict) -> list[dict]:
    with open(snapshot["manifest-list"], "rb") as fh:
        return read_avro_ocf(fh.read())["records"]


def snapshot_files(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Live data files of a snapshot: status EXISTING/ADDED entries
    across all its manifests (DELETED tombstones drop). Manifest decode
    is executor-side; only the manifest LIST rides the driver."""
    from collections.abc import Iterator

    import pandas as pd

    meta = read_table_metadata(table_path)
    snap = _pick_snapshot(meta, snapshot_id)
    manifests = [m["manifest_path"] for m in _manifest_list(snap)]
    if not manifests:
        raise ValueError("iceberg: snapshot has no manifests — quarantine")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "file_path", "file_format", "partition_json",
            "record_count", "file_size_in_bytes", "status",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for path in pdf["manifest_path"]:
                with open(path, "rb") as fh:
                    recs = read_avro_ocf(fh.read())["records"]
                for e in recs:
                    df_ = e["data_file"]
                    rows["file_path"].append(df_["file_path"])
                    rows["file_format"].append(df_["file_format"])
                    rows["partition_json"].append(
                        json.dumps(df_["partition"], sort_keys=True)
                    )
                    rows["record_count"].append(df_["record_count"])
                    rows["file_size_in_bytes"].append(df_["file_size_in_bytes"])
                    rows["status"].append(e["status"])
            yield pd.DataFrame(rows)

    paths = spark.createDataFrame(
        [(m,) for m in manifests], "manifest_path string"
    ).repartition(min(len(manifests), 32))
    entries = paths.mapInPandas(
        decode,
        "file_path string, file_format string, partition_json string, "
        "record_count long, file_size_in_bytes long, status int",
    )
    return entries.filter(F.col("status") != 2).drop("status")


def manifest_churn(spark: SparkSession, table_path: str) -> DataFrame:
    """Per-manifest add/delete accounting straight off the manifest
    list — the compaction planner's view, no manifest opens at all."""
    meta = read_table_metadata(table_path)
    snap = _pick_snapshot(meta, None)
    recs = _manifest_list(snap)
    return spark.createDataFrame(
        [
            (
                m["manifest_path"],
                m["added_files_count"],
                m["deleted_files_count"],
                m["added_rows_count"],
                m["deleted_rows_count"],
            )
            for m in recs
        ],
        "manifest_path string, n_added int, n_deleted int, "
        "rows_added long, rows_deleted long",
    )


def expire_snapshots_plan(
    spark: SparkSession, table_path: str, keep_snapshot_id: int | None = None
) -> DataFrame:
    """Expire-snapshots planning: which data files become ORPHANS when
    every snapshot except the kept one (default: current) is expired —
    files referenced by an expired snapshot's manifests and NOT live in
    the kept snapshot. This is the file-level reachability diff every
    Iceberg maintenance job computes before deleting anything; output
    is the delete worklist, not a side effect. Both sides are the
    executor-decoded manifest walks of snapshot_files; the diff is a
    left-anti join on file_path (one shuffle on the file key)."""
    meta = read_table_metadata(table_path)
    keep = keep_snapshot_id if keep_snapshot_id is not None else meta[
        "current-snapshot-id"
    ]
    kept_live = snapshot_files(spark, table_path, keep).select("file_path")
    orphans = None
    for s in meta.get("snapshots", []):
        if s["snapshot-id"] == keep:
            continue
        old = snapshot_files(spark, table_path, s["snapshot-id"]).select(
            "file_path", "record_count", "file_size_in_bytes"
        )
        orphans = old if orphans is None else orphans.unionByName(old)
    if orphans is None:
        raise ValueError("iceberg: nothing to expire — only one snapshot")
    return (
        orphans.join(kept_live, "file_path", "left_anti")
        .dropDuplicates(["file_path"])
    )


def ensure_demo_iceberg_table(sf_dir: str, bucket: int = 25) -> str:
    """Spec-shaped demo table derived from ``documents`` (same closed
    forms as the Delta demo): snapshot 100 = every doc ADDED; snapshot
    200 (current) = per-bucket manifests where churn docs (doc_id%9==8)
    flip to DELETED. Odd buckets' manifests use the deflate codec.
    Every cell reconstructs from doc_id alone."""
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
        tempfile.gettempdir(), "spark_graft_iceberg_demo_v1", f"t-{digest}"
    )
    done = root + ".done"
    if os.path.exists(done):
        return root
    mdir = os.path.join(root, "metadata")
    fdir = os.path.join(root, "manifests")
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(fdir, exist_ok=True)

    def entry(d: int, n: int, status: int) -> dict:
        return {
            "status": status,
            "snapshot_id": 200 if status == 2 else 100,
            "data_file": {
                "file_path": f"data/part-{d:09d}.parquet",
                "file_format": "PARQUET",
                "partition": {"day": str(d % 7)},
                "record_count": n,
                "file_size_in_bytes": n * 8,
            },
        }

    buckets: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        d = int(doc_id)
        n = len(str(text).encode("utf-8"))
        buckets.setdefault(d // bucket, []).append((d, n))

    def write_manifest(name: str, entries: list[dict], k: int) -> str:
        path = os.path.join(fdir, name)
        blob = write_avro_ocf(
            entries,
            MANIFEST_ENTRY_SCHEMA,
            codec="deflate" if k % 2 else "null",
            sync=bytes([(k * 7 + i) % 256 for i in range(16)]),
        )
        with open(path, "wb") as fh:
            fh.write(blob)
        return path

    def list_rec(path: str, snap_id: int, added: list, deleted: list) -> dict:
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "added_snapshot_id": snap_id,
            "added_files_count": len(added),
            "existing_files_count": 0,
            "deleted_files_count": len(deleted),
            "added_rows_count": sum(n for _, n in added),
            "deleted_rows_count": sum(n for _, n in deleted),
        }

    lists = {}
    for snap_id in (100, 200):
        recs = []
        for k, members in sorted(buckets.items()):
            if snap_id == 100:
                added, deleted = members, []
                ents = [entry(d, n, 1) for d, n in members]
            else:
                added = [(d, n) for d, n in members if d % 9 != 8]
                deleted = [(d, n) for d, n in members if d % 9 == 8]
                ents = [entry(d, n, 1) for d, n in added] + [
                    entry(d, n, 2) for d, n in deleted
                ]
            path = write_manifest(f"m-{snap_id}-{k:05d}.avro", ents, k)
            recs.append(list_rec(path, snap_id, added, deleted))
        lp = os.path.join(mdir, f"snap-{snap_id}.avro")
        with open(lp, "wb") as fh:
            fh.write(
                write_avro_ocf(recs, MANIFEST_FILE_SCHEMA, sync=b"\x01" * 16)
            )
        lists[snap_id] = lp

    meta = {
        "format-version": 2,
        "table-uuid": digest,
        "location": root,
        "current-snapshot-id": 200,
        "snapshots": [
            {
                "snapshot-id": sid,
                "sequence-number": i + 1,
                "timestamp-ms": 1_700_000_000_000 + i,
                "manifest-list": lists[sid],
                "summary": {"operation": "append" if sid == 100 else "delete"},
            }
            for i, sid in enumerate((100, 200))
        ],
    }
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    with open(done, "w") as fh:
        fh.write("ok\n")
    return root
