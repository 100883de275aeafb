"""Sketch-prefiltered exact aggregation.

The exact-vs-sketch ledger (BENCH.md) documents the 100 TB path for the
exact-heavy queries; this module adds the complementary pattern: a
bounded-memory sketch PREFILTER in front of an exact aggregate, so the
final answer is still exact but the expensive shuffle only sees
candidate keys.

Count-min heavy hitters, two passes:

  pass 1  build a depth x width count-min sketch of the key stream as a
          (row, cell) -> count aggregate — map-side combinable groupBy
          on at most depth*width cells, then a BOUNDED collect of
          depth*width scalars (4 KiB at the default 4x1024; independent
          of data size).
  pass 2  a key can have true count >= T only if ALL of its depth cells
          have sketch count >= T (CMS never underestimates). Filter the
          raw rows map-side with depth IN-list probes against the hot
          cells of each sketch row, then exact-count the survivors and
          apply the threshold.

Exactness: every true heavy hitter passes the cell filter (its own
count already puts every one of its cells over T), and the exact
recount removes all false positives — output == plain GROUP BY/HAVING.
At 100 TB the win is that the exact-count shuffle receives only rows
whose key collides with a hot cell in all depth rows, a vanishing
fraction when T is large; the sketch pass itself reduces to depth*width
partial counters per partition (Tungsten hash agg, no spill).

The sketch hash needs only determinism (it never crosses engines — the
oracle is the plain exact SQL), so xxhash64(key, row_salt) is used
directly rather than the portable md5 arithmetic the cross-engine
operators require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cms_cell(key_col, row_idx: int, width: int):
    """Deterministic cell index for sketch row ``row_idx``."""
    return F.pmod(F.xxhash64(key_col, F.lit(row_idx)), F.lit(width))


def count_min_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Exact counts of keys occurring >= ``threshold`` times, with a
    count-min sketch prefilter so only candidate rows reach the exact
    aggregation. Returns ``(key_col, n)``.
    """
    keys = df.select(F.col(key_col).alias("k"))

    # Pass 1: sketch as (row, cell) partial counts — depth rows per input
    # row via a single generated array, one map-side-combinable groupBy.
    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_cell(F.col("k"), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.r", "rc.c")
    sketch = cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    # Bounded collect: at most depth*width rows regardless of input size.
    hot: dict[int, list[int]] = {r: [] for r in range(depth)}
    for row in sketch.filter(F.col("cnt") >= threshold).collect():
        hot[row["r"]].append(row["c"])

    # Pass 2: map-side candidate filter (ALL depth cells hot), then the
    # exact count + threshold. Empty hot list for any row => no key can
    # qualify.
    if any(len(v) == 0 for v in hot.values()):
        return (
            keys.groupBy(F.col("k").alias(key_col))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.lit(False))
        )
    cond = None
    for r in range(depth):
        if len(hot[r]) == width:
            # Every cell of this sketch row is over the threshold, so the
            # row's membership probe is TRUE for all keys — evaluating it
            # (an xxhash64 + width-entry INSET per input row) prunes
            # nothing. Happens whenever rows/width >> threshold (e.g. a
            # low threshold at bench scale, or an under-sized width at
            # 100 TB); the exact recount below applies the threshold, so
            # skipping a no-op probe cannot change the output.
            continue
        c = cms_cell(F.col("k"), r, width).isin(hot[r])
        cond = c if cond is None else (cond & c)
    if cond is not None:
        keys = keys.filter(cond)
    return (
        keys.groupBy(F.col("k").alias(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def kmv_sketches(
    df,
    key_col: str,
    seg_col: str,
    k: int = 128,
):
    """K-minimum-values distinct sketch per segment: the k smallest
    28-bit md5 hashes of ``key_col`` (house hash convention, so the SQL
    oracle reproduces every hash bit-exactly).

    Returns (segment, h, rn) rows with rn <= k — a mergeable sketch:
    union = k smallest of the concatenation, intersection estimated by
    the fraction of union-sketch members present in both sides (the
    standard KMV set-operation estimators, Beyer et al. 2007).

    Scale note: the per-segment k-smallest is a window rank here (one
    sort per segment of its DISTINCT hash set). At warehouse scale the
    same sketch is built with per-partition k-smallest partials merged
    associatively — the mergeability that makes KMV a sketch at all;
    the window form keeps the gate path in one declarative plan.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 7), 16, 10).cast(
        "long"
    )
    uniq = df.select(F.col(seg_col).alias("segment"), h.alias("h")).distinct()
    w = Window.partitionBy("segment").orderBy("h")
    return uniq.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def kmv_estimate(sketch, k: int = 128):
    """Distinct-count estimate per segment from a kmv_sketches frame:
    (k-1) * 2^28 / kth_min when the sketch is full, else the exact
    member count (a sketch smaller than k holds the whole set)."""
    agg = sketch.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_mem"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_mem") < k, F.col("n_mem").cast("double")
    ).otherwise(F.lit(float((k - 1) * (1 << 28))) / F.col("kth"))
    return agg.select("segment", est.alias("est_distinct"))
