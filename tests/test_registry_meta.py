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


def test_judged_green_entries_unchanged():
    """Staleness guard (VERDICT r2 #8): every query in _JUDGED_GREEN —
    the set the gate rotation sorts BEHIND the judging window — must be
    byte-identical (sql + builder source) to the snapshot taken when its
    driver verdict was recorded. Editing a judged query without removing
    it from _JUDGED_GREEN silently ships unverified code behind a stale
    green verdict (the rolling_sums/b7648b7 class). On failure: remove
    the query from _JUDGED_GREEN (it re-sorts to the front), or if its
    verdict is genuinely fresh, rerun tools/gen_fingerprints.py."""
    import hashlib
    import inspect
    import json

    from shared_etl_pipelines_spark.queries import _JUDGED_GREEN

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "query_fingerprints.json")
    with open(path) as fh:
        pinned = json.load(fh)
    stale = []
    for name in sorted(_JUDGED_GREEN):
        if name not in REGISTRY:
            continue
        qd = REGISTRY[name]
        blob = (qd.sql or "") + "\x00" + inspect.getsource(qd.fn)
        cur = hashlib.sha256(blob.encode()).hexdigest()
        if name not in pinned:
            stale.append((name, "no pinned fingerprint — rerun tools/gen_fingerprints.py"))
        elif pinned[name] != cur:
            stale.append((name, "modified since verdict — remove from _JUDGED_GREEN"))
    assert not stale, stale


def test_no_gate_hostile_output_types(spark, sf_dir):
    """The external gate's canonicalizer hashes every output cell: array/
    map/struct columns crash it (CORRECTNESS_r02 embedding_pca_project:
    'unhashable type: list'), and raw timestamps hash differently across
    session timezones. Audit EVERY registry entry's analyzed schema —
    batch queries must emit only scalar, non-timestamp columns. Streaming
    queries are exempt (never gate-judged) but still scanned for arrays."""
    from pyspark.sql import types as T

    bad = []
    for name, qd in REGISTRY.items():
        if "streaming" in qd.tags:
            continue
        try:
            schema = qd.fn(spark, sf_dir).schema
        except Exception as e:  # analysis failure is its own red flag
            bad.append((name, f"does not analyze: {e}"))
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f"{f.name} is {f.dataType.simpleString()}"))
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
                bad.append((name, f"{f.name} is a raw timestamp"))
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


def test_rotation_tiers_are_disjoint_and_resolvable():
    """A query must never sit in both the re-front tier and the
    judged-green back block (the walk order would silently depend on
    dict-merge order), and every tier member must exist in the
    registry."""
    import shared_etl_pipelines_spark.queries as Q

    cf = set(Q._CARRYOVER_FIRST)
    assert not (cf & set(Q._JUDGED_GREEN))
    assert all(n in Q.REGISTRY for n in cf)
    assert all(n in Q.REGISTRY for n in Q._FORCE_FRONT)
