"""Slowly-changing-dimension (type 2) merge.

Row-level generalization of the reference's keyed catalog upsert
(catalog_json_upsert, pipelines/tiger/county.yml:65-72 — MERGE by
dataset_id with provenance): instead of overwriting matched records, the
dimension keeps full history with [valid_from, valid_to) intervals and a
NULL valid_to marking the current row.

One snapshot merge is a single Spark plan: current ⟗ snapshot on the
business key (one shuffle, or broadcast when the snapshot is a trickle),
row fates decided by attribute comparison, history rows passed through
untouched. Without Delta/Iceberg the result is written back
partition-overwrite; with them the same frame feeds MERGE INTO.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    snap_date: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merge ``snapshot`` (one row per key, the state observed at
    ``snap_date``) into SCD2 dimension ``dim``.

    Row fates:
    - history rows (``valid_to`` not NULL): passed through unchanged;
    - unchanged current rows, and current rows whose key is absent from
      the snapshot: kept open;
    - changed current rows: closed (``valid_to`` = snap_date) AND a new
      open row inserted with ``valid_from`` = snap_date;
    - brand-new keys: inserted open with ``valid_from`` = snap_date.

    NULL-safe attribute comparison (``<=>``), so NULL -> value and
    value -> NULL both count as changes.
    """
    history = dim.filter(F.col(to_col).isNotNull())
    current = dim.filter(F.col(to_col).isNull())

    # presence on each side of the outer join is detected via valid_from /
    # a sentinel — never via attr nullness (all-NULL attrs is a valid row)
    snap = snapshot.select(
        *[F.col(k) for k in key_cols],
        F.lit(1).alias("_snap_present"),
        *[F.col(a).alias(f"_snap_{a}") for a in attr_cols],
    )
    j = current.join(snap, key_cols, "full_outer")
    in_dim = F.col(from_col).isNotNull()
    in_snap = F.col("_snap_present").isNotNull()

    unchanged_pred = reduce(
        lambda a, b: a & b,
        [F.col(a).eqNullSafe(F.col(f"_snap_{a}")) for a in attr_cols],
    )

    dim_cols = [*key_cols, *attr_cols, from_col, to_col]

    kept = j.filter(in_dim & (~in_snap | unchanged_pred)).select(*dim_cols)
    closed = (
        j.filter(in_dim & in_snap & ~unchanged_pred)
        .withColumn(to_col, F.lit(snap_date).cast("date"))
        .select(*dim_cols)
    )
    opened = (
        j.filter(in_snap & (~in_dim | ~unchanged_pred))
        .select(
            *key_cols,
            *[F.col(f"_snap_{a}").alias(a) for a in attr_cols],
            F.lit(snap_date).cast("date").alias(from_col),
            F.lit(None).cast("date").alias(to_col),
        )
    )
    return history.select(*dim_cols).unionByName(kept).unionByName(closed).unionByName(
        opened
    )
