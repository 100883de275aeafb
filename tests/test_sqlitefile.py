"""SQLite file-format reader: cross-checks against the stdlib sqlite3
writer (independent implementation), overflow chains, IPK aliasing,
and refusal paths."""

import sqlite3
import struct

import pytest

from shared_etl_pipelines_spark.sources import sqlitefile as S


def _db(page_size=512, n=200, overflow=True):
    con = sqlite3.connect(":memory:")
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute(
        "CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT, score REAL,"
        " flag INTEGER)"
    )
    rows = [(r, "x" * ((r * 7) % 13 + 1), (r % 8) / 4.0, r % 2) for r in range(n)]
    con.executemany("INSERT INTO docs VALUES (?,?,?,?)", rows)
    if overflow:
        con.execute(
            "INSERT INTO docs VALUES (?,?,?,?)", (1000, "y" * 1234, 0.5, None)
        )
        rows.append((1000, "y" * 1234, 0.5, None))
    con.commit()
    blob = con.serialize()
    con.close()
    return blob, rows


def test_header_schema_and_multi_page_scan():
    blob, rows = _db()
    hdr = S.parse_header(blob)
    assert hdr["page_size"] == 512 and hdr["n_pages"] > 3  # real b-tree
    sch = S.read_schema(blob)
    assert [(s["type"], s["name"]) for s in sch] == [("table", "docs")]
    got = S.scan_table(blob, "docs")
    assert [(rid, tuple(v)) for rid, v in got] == [(r[0], r) for r in rows]
    # interior pages genuinely present (0x05 somewhere past page 1)
    types = {blob[(p - 1) * 512 + (100 if p == 1 else 0)]
             for p in range(1, hdr["n_pages"] + 1)}
    assert 0x05 in types


def test_overflow_chain_reassembles_exactly():
    blob, rows = _db(n=3, overflow=True)
    got = dict(S.scan_table(blob, "docs"))
    assert got[1000][1] == "y" * 1234  # spilled across >2 overflow pages


def test_ipk_alias_resolves_to_rowid():
    blob, _ = _db(n=5, overflow=False)
    got = S.scan_table(blob, "docs")
    assert all(rid == vals[0] for rid, vals in got)


def test_value_types_roundtrip():
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (a, b, c, d, e, f)")
    con.execute(
        "INSERT INTO t VALUES (?,?,?,?,?,?)",
        (None, -(2**40), 1.5, "héllo", b"\x00\xff", 1),
    )
    con.commit()
    blob = con.serialize()
    (rowid, vals), = S.scan_table(blob, "t")
    assert vals == [None, -(2**40), 1.5, "héllo", b"\x00\xff", 1]


def test_refusals():
    blob, _ = _db(n=3)
    with pytest.raises(ValueError, match="bad magic"):
        S.parse_header(b"not a database" + blob[14:])
    with pytest.raises(ValueError, match="no such table"):
        S.scan_table(blob, "missing")
    # UTF-16 encoding refuses (flip the header's encoding word)
    b2 = bytearray(blob)
    struct.pack_into(">I", b2, 56, 2)
    with pytest.raises(ValueError, match="encoding"):
        S.parse_header(bytes(b2))
    # truncated file: a page referenced beyond EOF
    with pytest.raises(ValueError):
        S.scan_table(blob[: len(blob) // 2], "docs")


def test_without_rowid_scan_undoes_pk_reordering():
    """WITHOUT ROWID rows come back in DECLARED column order even when
    the composite PK reorders the stored record, across multi-level
    interior index pages and overflow chains."""
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA page_size=512")
    con.execute(
        "CREATE TABLE w (b TEXT, a INTEGER, c BLOB, PRIMARY KEY (a, b))"
        " WITHOUT ROWID"
    )
    rows = [
        (f"s{i % 7}" * (i % 40 + 1), i, bytes([i % 256]) * (i % 900))
        for i in range(1500)
    ]
    con.executemany("INSERT INTO w VALUES (?,?,?)", rows)
    con.commit()
    blob = con.serialize()
    got = S.scan_table(blob, "w")
    assert all(rid is None for rid, _ in got)
    assert sorted(tuple(v) for _, v in got) == sorted(rows)
    # in-order traversal => PK (a, b) order
    keys = [(v[1], v[0]) for _, v in got]
    assert keys == sorted(keys)


def test_real_index_scan_matches_sqlite_order():
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?,?)",
        [(i, f"v{(i * 37) % 100:03d}" * (i % 9 + 1)) for i in range(800)],
    )
    con.execute("CREATE INDEX idx_v ON t(v)")
    con.commit()
    blob = con.serialize()
    ref = list(con.execute("SELECT v, rowid FROM t ORDER BY v, rowid"))
    assert [(e[0], e[1]) for e in S.scan_index(blob, "idx_v")] == ref
    with pytest.raises(ValueError, match="no such index"):
        S.scan_index(blob, "nope")
    # a table walk over an index root still refuses loudly
    hdr = S.parse_header(blob)
    idx_root = next(
        s["rootpage"] for s in S.read_schema(blob) if s["type"] == "index"
    )
    with pytest.raises(ValueError, match="index b-tree page"):
        list(S.table_rows(blob, hdr, idx_root))


def test_spark_scan_and_quarantine(spark, sf_dir):
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.sources.sqlitefile import (
        scan_sqlite_assets,
        synthetic_sqlite_assets,
    )
    from shared_etl_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    out = scan_sqlite_assets(synthetic_sqlite_assets(docs)).collect()
    assert out and all(r["ok"] for r in out)
    assert all(r["n_pages"] >= 3 for r in out)  # multi-page trees
    garbage = spark.createDataFrame(
        [(7, "application/vnd.sqlite3", bytearray(b"\x00" * 200))],
        "doc_id bigint, media_type string, blob binary",
    )
    q = scan_sqlite_assets(garbage).collect()
    assert len(q) == 1 and not q[0]["ok"] and "magic" in q[0]["reason"]


def test_without_rowid_pk_case_insensitive():
    """SQLite identifiers are case-insensitive: a PK list naming the
    column in a different case must still reorder (ADVICE r12), and an
    unknown PK name must refuse with the quarantine ValueError, never
    an IndexError."""
    cols, pk = S._parse_create_table(
        'CREATE TABLE kv (a INTEGER, b TEXT, PRIMARY KEY ("A"))'
    )
    assert cols == ["a", "b"] and pk == ["a"]
    try:
        S._parse_create_table(
            "CREATE TABLE kv (a INTEGER, PRIMARY KEY (zz))"
        )
    except ValueError as e:
        assert "quarantine" in str(e)
    else:
        raise AssertionError("unknown PK name must refuse")
