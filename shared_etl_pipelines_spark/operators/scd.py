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


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """CDC between two snapshots of a keyed table: one full-outer join on
    the key, change classified by null-side and a value hash over the
    non-key columns (computed pre-join, so the join carries two slim
    (key, hash) sides plus nothing else until the classification).

    Returns ``(key_cols..., change_type)`` with change_type in
    {'insert', 'delete', 'update'}; unchanged rows are dropped in the
    join output filter. At 100 TB this is the standard snapshot-compare:
    a single co-partitioned shuffle on the key, value width reduced to
    one 32-char digest per side before the exchange.
    """
    val_cols_old = [c for c in old.columns if c not in key_cols]
    val_cols_new = [c for c in new.columns if c not in key_cols]

    def digest(df: DataFrame, val_cols: list[str], name: str) -> DataFrame:
        h = F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in val_cols]))
        return df.select(*key_cols, h.alias(name))

    o = digest(old, val_cols_old, "_h_old")
    n = digest(new, val_cols_new, "_h_new")
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("insert"))
        .when(F.col("_h_new").isNull(), F.lit("delete"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
