"""Own-bytes parquet writer: files must read back value-identically
through BOTH reference readers (pyarrow + DuckDB) and the repo's own
page reader; statistics verified via DuckDB (pyarrow's PARQUET-251
trust list ignores stats from unknown writers)."""

import io
import os
import random
import tempfile

import duckdb
import pyarrow.parquet as pq
import pytest

from shared_etl_pipelines_spark.sources.parquet_pages import read_all_columns
from shared_etl_pipelines_spark.sources.parquet_write import write_parquet


def test_three_reader_cross_check():
    rng = random.Random(3)
    for trial in range(10):
        n = rng.randrange(0, 1500)
        ints = [rng.randrange(-10**12, 10**12) if rng.random() > 0.2
                else None for _ in range(n)]
        dbls = [rng.random() if rng.random() > 0.1 else None
                for _ in range(n)]
        strs = ["s" + str(rng.randrange(100)) if rng.random() > 0.15
                else None for _ in range(n)]
        bools = [rng.random() > 0.5 if rng.random() > 0.1 else None
                 for _ in range(n)]
        comp = rng.choice(["UNCOMPRESSED", "SNAPPY"])
        blob = write_parquet(
            [("i", "int64", ints), ("d", "double", dbls),
             ("s", "utf8", strs), ("b", "boolean", bools)],
            compression=comp, row_group_size=max(64, n // 3 or 64),
        )
        ref = pq.read_table(io.BytesIO(blob))
        for c, exp in (("i", ints), ("d", dbls), ("s", strs), ("b", bools)):
            assert ref.column(c).to_pylist() == exp, (trial, c, comp)
        tf = os.path.join(tempfile.gettempdir(), "wp_gate.parquet")
        with open(tf, "wb") as fh:
            fh.write(blob)
        got = duckdb.sql(f"SELECT * FROM '{tf}'").fetchall()
        assert [tuple(r) for r in got] == list(zip(ints, dbls, strs, bools))
        assert read_all_columns(blob, "i") == ints  # self-read


def test_statistics_written_correctly():
    ints = [None, 3, 6, 9, None, 15, 18, 21, 24]
    blob = write_parquet([("iv", "int64", ints)], row_group_size=8)
    tf = os.path.join(tempfile.gettempdir(), "wp_stats.parquet")
    with open(tf, "wb") as fh:
        fh.write(blob)
    rows = duckdb.sql(
        f"SELECT stats_min_value, stats_max_value, stats_null_count "
        f"FROM parquet_metadata('{tf}') ORDER BY row_group_id"
    ).fetchall()
    assert rows == [("3", "21", 2), ("24", "24", 0)]


def test_refusals():
    with pytest.raises(ValueError, match="codec"):
        write_parquet([("x", "int64", [1])], compression="LZO")
    with pytest.raises(ValueError, match="ragged"):
        write_parquet([("x", "int64", [1]), ("y", "int64", [1, 2])])


def test_dictionary_pages_cross_read(tmp_path):
    """use_dictionary=True: PLAIN dictionary page + RLE/bit-packed
    PLAIN_DICTIONARY data page, read back by pyarrow, DuckDB AND the
    repo's own page reader — including nulls, long runs (RLE runs),
    scattered values (bit-packed groups) and the all-distinct fallback
    to PLAIN."""
    import duckdb

    from shared_etl_pipelines_spark.sources.parquet_pages import (
        read_all_columns,
    )
    from shared_etl_pipelines_spark.sources.parquet_write import write_parquet

    rng = random.Random(9)
    n = 5000
    cols = [
        ("k", "int64", [rng.randrange(50) for _ in range(n)]),
        ("tag", "utf8",
         [None if i % 11 == 0 else f"tag{i % 7}" for i in range(n)]),
        ("runs", "utf8",
         ["A"] * 2000 + ["B"] * 2000 + [f"x{i % 3}" for i in range(1000)]),
        ("v", "double", [rng.random() for _ in range(n)]),  # all distinct
    ]
    for codec in ("UNCOMPRESSED", "SNAPPY", "ZSTD"):
        blob = write_parquet(
            cols, compression=codec, row_group_size=1024, use_dictionary=True
        )
        t = pq.read_table(io.BytesIO(blob))
        for name, _k, vals in cols:
            assert t.column(name).to_pylist() == vals, (codec, name)
        p = tmp_path / f"d_{codec}.parquet"
        p.write_bytes(blob)
        cnt, tags = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT tag) FROM '{p}'"
        ).fetchone()
        assert (cnt, tags) == (n, 7)
        for name, kind, vals in cols:
            got = read_all_columns(blob, name)
            if kind == "utf8":
                got = [x.decode("utf-8") if x is not None else None for x in got]
            assert got == vals, (codec, name)
        md = pq.read_metadata(io.BytesIO(blob))
        encs = md.row_group(0).column(1).encodings
        assert "PLAIN_DICTIONARY" in encs or "RLE_DICTIONARY" in encs
        # the all-distinct double column fell back to PLAIN
        assert "PLAIN" in md.row_group(0).column(3).encodings
    plain = write_parquet(cols, compression="UNCOMPRESSED")
    dictd = write_parquet(cols, compression="UNCOMPRESSED", use_dictionary=True)
    assert len(dictd) < len(plain) * 0.7  # the size win is real


def test_own_page_indexes_roundtrip(tmp_path):
    """page_rows + write_page_index: multi-page chunks with
    ColumnIndex/OffsetIndex sections that the repo's own page-pruned
    reader consumes, while pyarrow and DuckDB still read the data."""
    import duckdb

    from shared_etl_pipelines_spark.sources.parquet_pageindex import (
        read_all_pruned,
        read_page_indexes,
    )
    from shared_etl_pipelines_spark.sources.parquet_footer import (
        parse_parquet_footer,
    )
    from shared_etl_pipelines_spark.sources.parquet_write import write_parquet

    n = 20000
    cols = [
        ("k", "int64", list(range(n))),
        ("tag", "utf8",
         [None if i % 13 == 0 else f"t{i // 500}" for i in range(n)]),
    ]
    for codec in ("SNAPPY", "ZSTD", "UNCOMPRESSED"):
        blob = write_parquet(
            cols, compression=codec, row_group_size=8192,
            use_dictionary=True, page_rows=512, write_page_index=True,
        )
        t = pq.read_table(io.BytesIO(blob))
        assert t.column("k").to_pylist() == cols[0][2]
        assert t.column("tag").to_pylist() == cols[1][2]
        p = tmp_path / f"own_pi_{codec}.parquet"
        p.write_bytes(blob)
        (cnt,) = duckdb.sql(f"SELECT COUNT(*) FROM '{p}'").fetchone()
        assert cnt == n
        vals, tot, rd = read_all_pruned(str(p), "k", 3000, 3300)
        assert rd < tot  # pruning engaged on our own index
        assert sorted(v for _, v in vals if 3000 <= v <= 3300) == list(
            range(3000, 3301)
        )
        foot = parse_parquet_footer(blob)
        idx = read_page_indexes(str(p), foot, 0, "k")
        assert idx["boundary_order"] == 1  # sorted ints -> ASCENDING
        assert len(idx["pages"]) == 16  # 8192 rows / 512 per page
        # null pages tracked on the nullable column
        tidx = read_page_indexes(str(p), foot, 0, "tag")
        assert all(pg["null_count"] > 0 for pg in tidx["pages"])


def test_data_page_v2_cross_readers(tmp_path):
    """page_version=2: DataPageHeaderV2 pages (uncompressed definition
    levels ahead of separately-compressed values) read back by pyarrow,
    DuckDB and the own page reader across codecs and dictionary
    settings, including the page-pruned path."""
    import duckdb

    from shared_etl_pipelines_spark.sources.parquet_pageindex import (
        read_all_pruned,
    )
    from shared_etl_pipelines_spark.sources.parquet_pages import (
        read_all_columns,
    )
    from shared_etl_pipelines_spark.sources.parquet_write import write_parquet

    cols = [
        ("k", "int64", [None if i % 11 == 0 else i for i in range(3000)]),
        ("s", "utf8", [f"t{i % 9}" for i in range(3000)]),
    ]
    for codec in ("UNCOMPRESSED", "SNAPPY", "ZSTD"):
        for dic in (False, True):
            blob = write_parquet(
                cols, compression=codec, page_rows=256, use_dictionary=dic,
                page_version=2, write_page_index=True,
            )
            t = pq.read_table(io.BytesIO(blob))
            assert t.column("k").to_pylist() == cols[0][2], (codec, dic)
            assert t.column("s").to_pylist() == cols[1][2], (codec, dic)
            assert read_all_columns(blob, "k") == cols[0][2]
            p = tmp_path / f"v2_{codec}_{dic}.parquet"
            p.write_bytes(blob)
            (n,) = duckdb.sql(f"SELECT COUNT(*) FROM '{p}'").fetchone()
            assert n == 3000
            vals, tot, rd = read_all_pruned(str(p), "k", 700, 800)
            assert rd < tot
            got = sorted(
                v for _, v in vals
                if v is not None and 700 <= v <= 800
            )
            assert got == [v for v in range(700, 801) if v % 11 != 0]
    with pytest.raises(ValueError, match="page_version"):
        write_parquet(cols, page_version=3)


def test_double_dictionary_preserves_zero_sign_and_nan():
    """ADVICE r12 (medium): the dictionary must key doubles on the raw
    bit pattern — Python equality folds -0.0 into 0.0, which broke the
    value-identical readback contract for columns holding both signs."""
    import math

    vals = [0.0, -0.0, 1.5, -0.0, 0.0, float("nan")] * 8
    blob = write_parquet(
        [("x", "double", vals)], compression="UNCOMPRESSED",
        use_dictionary=True,
    )
    for got in (
        pq.read_table(io.BytesIO(blob)).column("x").to_pylist(),
        read_all_columns(blob, "x"),
    ):
        assert len(got) == len(vals)
        for g, v in zip(got, vals):
            if math.isnan(v):
                assert math.isnan(g)
            else:
                assert g == v and math.copysign(1, g) == math.copysign(1, v)


def test_v2_pages_advertise_rle_dictionary():
    """ADVICE r12 (low): page_version=2 files must carry RLE_DICTIONARY
    (8) for data pages and PLAIN for the dictionary page — the spec
    deprecates PLAIN_DICTIONARY for new files."""
    vals = ["a", "b", "a", "c"] * 400
    blob = write_parquet(
        [("s", "utf8", vals)], compression="SNAPPY",
        use_dictionary=True, page_version=2, page_rows=256,
    )
    md = pq.ParquetFile(io.BytesIO(blob)).metadata.row_group(0).column(0)
    assert "RLE_DICTIONARY" in md.encodings
    assert "PLAIN_DICTIONARY" not in md.encodings
    assert pq.read_table(io.BytesIO(blob)).column("s").to_pylist() == vals
    # the own page reader surfaces BYTE_ARRAY as raw bytes
    assert read_all_columns(blob, "s") == [v.encode() for v in vals]


def test_list_columns_three_reader_matrix():
    """r13 (VERDICT r12 task #8): the 3-level LIST encoding across
    codecs, page versions, and page splits — pyarrow and DuckDB must
    both read back value-identical lists, null lists and empty lists
    included."""
    import duckdb as _dd

    rows = [[1, 2, 3], None, [], [9], None, [5, 6], list(range(40))] * 20
    dbl = [
        [0.5 * i for i in range(len(r))] if r is not None else None
        for r in rows
    ]
    for codec in ("UNCOMPRESSED", "SNAPPY", "ZSTD"):
        for pv in (1, 2):
            blob = write_parquet(
                [
                    ("k", "int64", list(range(len(rows)))),
                    ("arr", "list<int64>", rows),
                    ("emb", "list<double>", dbl),
                ],
                compression=codec, page_version=pv, page_rows=16,
                row_group_size=64,
            )
            t = pq.read_table(io.BytesIO(blob))
            assert t.column("arr").to_pylist() == rows, (codec, pv)
            assert t.column("emb").to_pylist() == dbl, (codec, pv)
            fd, p = tempfile.mkstemp(suffix=".parquet")
            with os.fdopen(fd, "wb") as fh:
                fh.write(blob)
            try:
                n_elems, n_null = _dd.sql(
                    f"SELECT SUM(len(arr)), COUNT(*) FILTER (arr IS NULL)"
                    f" FROM read_parquet('{p}')"
                ).fetchone()
            finally:
                os.unlink(p)
            assert n_elems == sum(len(r) for r in rows if r is not None)
            assert n_null == sum(1 for r in rows if r is None)


def test_list_columns_refusals():
    with pytest.raises(ValueError, match="quarantine"):
        write_parquet([("a", "list<int64>", [[1, None]])])
    with pytest.raises(ValueError, match="quarantine"):
        write_parquet([("a", "list<utf8>", [["x"]])])
    with pytest.raises(ValueError, match="quarantine"):
        write_parquet(
            [("a", "list<int64>", [[1]])],
            write_page_index=True, page_rows=4,
        )


def test_alt_encodings_three_reader_matrix():
    """r13: DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY /
    DELTA_BYTE_ARRAY / BYTE_STREAM_SPLIT write paths — pyarrow, DuckDB
    and the own page reader all read back value-identically across
    codecs, page versions, multi-page and multi-row-group splits; the
    delta encoding genuinely shrinks sorted keys."""
    import duckdb as _dd

    rng = random.Random(5)
    n = 4000
    ts = sorted(rng.randrange(10**12, 10**12 + 10**9) for _ in range(n))
    ints = [rng.randrange(-10**9, 10**9) if rng.random() > 0.1 else None
            for _ in range(n)]
    urls = [None if i % 17 == 0 else f"https://example.org/p/{i//10}/d-{i}"
            for i in range(n)]
    dbls = [rng.random() * 1000 for _ in range(n)]
    cols = [("ts", "int64", ts), ("v", "int64", ints),
            ("url", "utf8", urls), ("x", "double", dbls)]
    maps = [
        {"ts": "DELTA_BINARY_PACKED", "v": "DELTA_BINARY_PACKED",
         "url": "DELTA_LENGTH_BYTE_ARRAY", "x": "BYTE_STREAM_SPLIT"},
        {"url": "DELTA_BYTE_ARRAY"},
    ]
    for codec in ("UNCOMPRESSED", "SNAPPY", "ZSTD"):
        for pv in (1, 2):
            for em in maps:
                blob = write_parquet(
                    cols, compression=codec, page_version=pv,
                    page_rows=700, row_group_size=2048,
                    column_encodings=em,
                )
                t = pq.read_table(io.BytesIO(blob))
                for nm, _k, vals in cols:
                    assert t.column(nm).to_pylist() == vals, (codec, pv, nm)
                fd, p = tempfile.mkstemp(suffix=".parquet")
                with os.fdopen(fd, "wb") as fh:
                    fh.write(blob)
                try:
                    cnt, smin = _dd.sql(
                        f"SELECT COUNT(*), MIN(ts) FROM read_parquet('{p}')"
                    ).fetchone()
                finally:
                    os.unlink(p)
                assert (cnt, smin) == (n, ts[0])
                for nm, k, vals in cols:
                    got = read_all_columns(blob, nm)
                    if k == "utf8":
                        got = [x.decode() if x is not None else None
                               for x in got]
                    assert got == vals, ("own", codec, pv, nm)
    plain = write_parquet([("ts", "int64", ts)], compression="UNCOMPRESSED")
    delta = write_parquet(
        [("ts", "int64", ts)], compression="UNCOMPRESSED",
        column_encodings={"ts": "DELTA_BINARY_PACKED"},
    )
    assert len(delta) < len(plain) // 3


def test_alt_encodings_refusals():
    cols = [("v", "int64", [1, 2]), ("s", "utf8", ["a", "b"]),
            ("x", "double", [0.5, 1.5])]
    for bad in (
        {"x": "DELTA_BINARY_PACKED"},   # kind mismatch
        {"nope": "BYTE_STREAM_SPLIT"},  # unknown column
        {"s": "BYTE_STREAM_SPLIT"},     # kind mismatch
        {"v": "BYTE_STREAM_SPLIT"},     # ints: DuckDB-compat refusal
        {"v": "RLE_FANCY"},             # unknown encoding
    ):
        with pytest.raises(ValueError):
            write_parquet(cols, column_encodings=bad)
