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

from pyspark.sql import DataFrame
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
        c = cms_cell(F.col("k"), r, width).isin(hot[r])
        cond = c if cond is None else (cond & c)
    return (
        keys.filter(cond)
        .groupBy(F.col("k").alias(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )
