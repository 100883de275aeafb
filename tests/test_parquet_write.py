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
        write_parquet([("x", "int64", [1])], compression="ZSTD")
    with pytest.raises(ValueError, match="ragged"):
        write_parquet([("x", "int64", [1]), ("y", "int64", [1, 2])])
