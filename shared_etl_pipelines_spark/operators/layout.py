"""Write-layout operators: Z-order clustering for multi-column data skipping.

At 100 TB the scan is the bottleneck, and parquet row-group min/max
pruning only skips what the write layout clustered. Sorting by one
column clusters that column alone; interleaving the bits of several
low-cardinality-bounded keys (a Z-order / Morton curve) bounds the
min/max range of EVERY interleaved column within each row group, so
single-column predicates on any of them skip most of the file.

The key is pure JVM bit arithmetic (shiftright/and/shiftleft/or —
whole-stage codegen'd, no UDF); writing is just
``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey).write``.
Reference counterpart: none (the reference's layout tool is one-file-
per-day directories); this is the multi-dimensional generalization its
daily partitioning hints at.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    Columns must be non-negative integers (callers bucket/offset first).
    Bit b of column i lands at position ``b * len(cols) + i``: columns
    share significance evenly, so sorting by the result clusters all of
    them at once. ``bits * len(cols)`` must fit in a long (<= 62).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if bits * len(cs) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * len(cs) + i))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``.

    Range-partition by the z-key (equal-size output files from the
    sampled distribution), sort within partitions, drop the key. Every
    row group then has tight min/max bounds on each clustered column.
    """
    keyed = df.withColumn("__z", zorder_key(list(cols), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical bit-interleave as ANSI SQL (oracle parity)."""
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            shift = b * len(cols) + i
            terms.append(f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {shift})")
    return " | ".join(terms)


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> dict:
    """Small-file compaction — the table-maintenance job every long-lived
    warehouse runs: N tiny parquet files become ceil(bytes/target) files
    of ~target size.

    Small files kill scans twice at 100 TB: footer/open overhead per
    file, and row groups too small for min/max pruning or full
    vectorized batches. Sizing comes from the FILE bytes actually on
    disk (Hadoop listing via the JVM — no data read), not a row count
    estimate, so compressed width is priced in. The rewrite is one
    round-robin repartition (or range partition + sort when sort_cols
    preserve a clustering) and one write; returns a summary dict
    {files_in, bytes_in, files_out} for the pipeline's lineage manifest.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    it = fs.listFiles(path, True)
    files_in = 0
    bytes_in = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            files_in += 1
            bytes_in += st.getLen()
    n_out = max(1, -(-bytes_in // target_file_bytes))
    df = spark.read.parquet(src_path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    return {"files_in": files_in, "bytes_in": int(bytes_in), "files_out": int(n_out)}


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table — Spark's co-location contract: two tables bucketed by the
    same key into the same bucket count join WITHOUT an exchange on
    either side (the classic big-fact x big-fact answer when broadcast
    is impossible and shuffle is the bottleneck). Bucket pruning also
    serves point lookups on the bucket key.

    At 100 TB this is a write-once cost paid at ingest; every
    subsequent co-keyed join, aggregation, or MERGE reads pre-shuffled
    data. (File-format note: bucketing metadata lives in the catalog,
    so this writes a managed table, not bare parquet paths.)
    """
    w = df.write.mode("overwrite").bucketBy(int(num_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
