"""Registry-level invariants: every entry must be well-formed before any
engine comparison runs — unique names, callable builders, oracle SQL that
DuckDB can at least PLAN against the real tables (catches alias typos and
dialect slips without paying a Spark run)."""

import os

import duckdb
import pytest

from shared_etl_pipelines_spark.queries import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_registry_entries_are_wellformed():
    assert len(REGISTRY) >= 120
    for name, qd in REGISTRY.items():
        assert name == name.strip().lower().replace(" ", "_"), name
        assert callable(qd.fn), name
        assert qd.doc, f"{name} has no doc"
        assert qd.sql is None or qd.sql.strip(), name


def test_all_oracle_sql_plans_in_duckdb(duck):
    bad = []
    for name, qd in REGISTRY.items():
        if qd.sql is None:
            continue
        try:
            duck.sql(f"EXPLAIN {qd.sql}")
        except Exception as e:
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_rows_only_queries_are_justified():
    """Every oracle-less entry must say why in its doc/tags — the driver
    records a weaker check for them, so they need an explicit rationale."""
    justified_tags = {"streaming", "approx", "sketch", "scale-path", "clustering",
                      "pca", "iterative", "source"}
    for name, qd in REGISTRY.items():
        if qd.sql is not None:
            continue
        assert justified_tags & set(qd.tags), f"{name} rows-only without rationale tag"
