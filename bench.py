"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs every registered query (minus the deliberately-exhaustive O(n^2)
correctness baselines, which exist only to verify their LSH-bucketed
scale-path counterparts) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full physical
execution, no driver collect overhead) — the same action a cluster job
would perform minus sink IO.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Exhaustive all-pairs baselines: correctness oracles for the LSH scale
# paths (near_dup_minhash_lsh / similarity_topk_lsh), not 100 TB operators.
# Streaming queries are dominated by fixed micro-batch startup at this
# scale — covered by tests/test_streaming.py, not throughput-benched.
EXCLUDE = {
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "near_dup_lsh_eval",  # embeds the O(n^2) baseline it evaluates
}


# Comma-separated query names to bench in isolation (same warmup/sweep
# as a full run, so numbers stay comparable); empty = everything.
ONLY = {
    n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n
}


def _excluded(name: str, qd) -> bool:
    if ONLY:
        return name not in ONLY
    return name in EXCLUDE or "streaming" in qd.tags


def run_query(fn, spark, sf_dir) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> None:
    # The driver parses exactly one JSON line from stdout. Spark (the JVM
    # inherits fd 1 at launch) and any library chatter must never reach it:
    # save the real stdout, point fd 1 at stderr for the whole run, and
    # write the summary line to the saved fd at the very end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from shared_etl_pipelines_spark.engine import get_spark, sweep_persistent_rdds
    from shared_etl_pipelines_spark.queries import REGISTRY

    spark = get_spark("bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM / parquet footer caches so per-query numbers measure the
    # queries, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    times: dict[str, float] = {}
    n_run = 0
    skipped_sweeps = 0
    for name, qd in REGISTRY.items():
        if _excluded(name, qd):
            continue
        # localCheckpoint storage is invisible to clearCache and
        # accumulates across ~20 iterative queries (embedding_dbscan
        # 23.5s -> 12.0s once swept); shared rationale and guard live in
        # engine.sweep_persistent_rdds
        n_run += 1
        try:
            sweep_persistent_rdds(spark)
            skipped_sweeps = 0
        except RuntimeError as e:
            # Guard tripped by listener-bus lag even after its quiesce
            # wait: skipping one sweep only delays storage reclamation;
            # sinking the whole walk over it would lose the measurement.
            # ADVICE r13 #3: unbounded consecutive skips would let
            # checkpoint/persist storage pile up across the walk and
            # skew later timings — after 3 in a row, fall back to a
            # plain clearCache (always safe) so at least SQL-visible
            # caches are reclaimed, and keep counting.
            skipped_sweeps += 1
            print(f"# sweep skipped before next query: {e}", file=sys.stderr)
            if skipped_sweeps >= 3:
                spark.catalog.clearCache()
                print(
                    f"# {skipped_sweeps} consecutive sweep skips — forced clearCache fallback",
                    file=sys.stderr,
                )
        if n_run % 40 == 0:
            spark.sparkContext._jvm.System.gc()
        best = None
        try:
            for _ in range(reps):
                t = run_query(qd.fn, spark, sf_dir)
                best = t if best is None else min(best, t)
                # isolation: drop caches a query persisted (LSH signature
                # frames) so reps and later queries start cold and aren't
                # measured under accumulated heap pressure
                spark.catalog.clearCache()
        except Exception as e:  # one broken query must not sink the run
            print(f"# {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr)

    total = round(sum(times.values()), 2)

    # The driver captures only the LAST 2,000 bytes of stdout; r1 and r2
    # both produced a summary line over that budget (115 queries x ~30
    # bytes), so the head of the JSON was truncated and the driver
    # recorded "parsed": null. Emit a compact line guaranteed under the
    # budget: totals always, then per-query seconds for as many of the
    # SLOWEST queries as fit; the complete table goes to bench_full.json.
    BUDGET = 1900
    # Subset runs (SPARK_GRAFT_BENCH_ONLY) write their table to a
    # separate file: bench_full.json is the full-registry floor record
    # and a 3-query re-measurement must not clobber it (this is how the
    # round-5 closing floor was lost — VERDICT r5 "what's wrong" #2).
    full_name = "bench_subset.json" if ONLY else "bench_full.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           full_name), "w") as fh:
        json.dump(
            {"metric": "headline_queries_total", "value": total, "unit": "sec",
             "sf": sf, "n_queries": len(times), "queries": times},
            fh, indent=1, sort_keys=True,
        )

    def _line(qdict: dict[str, float], omitted: int) -> str:
        payload = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(times),
            "queries": {k: round(v, 2) for k, v in qdict.items()},
        }
        if omitted:
            payload["queries_omitted"] = omitted
            payload["full_table"] = "bench_full.json"
        return json.dumps(payload, separators=(",", ":"))

    line = _line(times, 0)
    if len(line) > BUDGET:
        slowest = sorted(times.items(), key=lambda kv: (-kv[1], kv[0]))
        kept: dict[str, float] = {}
        for k, v in slowest:
            trial = _line({**kept, k: v}, len(times) - len(kept) - 1)
            if len(trial) > BUDGET:
                break
            kept[k] = v
        line = _line(kept, len(times) - len(kept))

    # stop the JVM before emitting: nothing may write after the JSON line
    spark.stop()
    os.write(real_stdout, (line + "\n").encode())
    os.close(real_stdout)


if __name__ == "__main__":
    main()
