"""Local replica of the driver's t2 correctness gate.

Runs every query in __spark_entry__.queries() on Spark AND its
oracle_sql() in DuckDB over the same parquet tables, then compares:
row count, sorted column names, and an order-insensitive value
comparison. Floats are compared both exactly (what a hash would see)
and with tolerance, so we can spot queries at risk of last-ulp
hash mismatches before the driver does.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

Chaos mode: set SPARK_GRAFT_MASTER / SPARK_GRAFT_SHUFFLE / SPARK_GRAFT_TZ
to run the gate under a different core count, shuffle-partition count, or
session timezone. Summation order varies with partitioning and rendering
varies with zone — results must be identical under ANY config (that is
what the integer-cents aggregation and the loader's UTC pin guarantee);
sweeping a few odd configs catches order-dependent rounding before the
driver's (unknown) session config does.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # arrays/lists (numpy from Spark, list from DuckDB): canonical tuple
    if hasattr(v, "tolist"):
        return tuple(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return v


def frame_to_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def values_equal(a, b, tol=0.0):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        if tol and abs(a - b) <= tol * max(1.0, abs(a), abs(b)):
            return True
        return False
    return a == b or str(a) == str(b)


def compare(name, spark_pdf, duck_pdf):
    ok = True
    msgs = []
    if len(spark_pdf) != len(duck_pdf):
        return False, [f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    sc, srows = frame_to_rows(spark_pdf)
    dc, drows = frame_to_rows(duck_pdf)
    if sc != dc:
        return False, [f"columns: spark={sc} duck={dc}"]
    exact_bad = approx_bad = 0
    first_bad = None
    for r1, r2 in zip(srows, drows):
        for c, (v1, v2) in zip(sc, zip(r1, r2)):
            if not values_equal(v1, v2):
                exact_bad += 1
                if not values_equal(v1, v2, tol=1e-9):
                    approx_bad += 1
                if first_bad is None:
                    first_bad = (c, v1, v2)
    if approx_bad:
        ok = False
        msgs.append(f"{approx_bad} cells differ beyond 1e-9; first={first_bad}")
    elif exact_bad:
        ok = False
        msgs.append(f"HASH-RISK: {exact_bad} cells differ only in last ulp; first={first_bad}")
    return ok, msgs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod

    master = os.environ.get("SPARK_GRAFT_MASTER")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE")
    tz = os.environ.get("SPARK_GRAFT_TZ")
    # extra chaos confs, semicolon-separated k=v (e.g. disable broadcasts:
    # SPARK_GRAFT_CONF='spark.sql.autoBroadcastJoinThreshold=-1')
    extra = os.environ.get("SPARK_GRAFT_CONF")
    if master or shuffle or tz or extra:
        from pyspark.sql import SparkSession

        b = (
            SparkSession.builder.master(master or "local[8]")
            .config("spark.sql.shuffle.partitions", shuffle or "8")
            .config("spark.sql.session.timeZone", tz or "UTC")
            .config("spark.ui.enabled", "false")
        )
        for kv in (extra or "").split(";"):
            if "=" in kv:
                k, _, v = kv.partition("=")
                b = b.config(k.strip(), v.strip())
        spark = b.getOrCreate()
        print(f"# chaos config: master={master} shuffle={shuffle} tz={tz} conf={extra}")
    else:
        from shared_etl_pipelines_spark.engine import get_spark

        spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok, msgs = compare(name, sdf, ddf)
        if ok:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
