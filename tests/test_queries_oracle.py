"""Every registered query must match its DuckDB oracle at sf0.001.

This is a fast local replica of the driver's t2 gate (which runs at
sf0.01); tools/check_correctness.py is the full-size version.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import TABLES, compare  # noqa: E402

from shared_etl_pipelines_spark.queries import REGISTRY  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, sf_dir).toPandas()
    if qd.sql is None:
        assert len(sdf) >= 0  # rows-only contract: runs and has a stable schema
        return
    ddf = duck.sql(qd.sql).df()
    ok, msgs = compare(name, sdf, ddf)
    assert ok, f"{name}: {'; '.join(msgs)}"
