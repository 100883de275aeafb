"""Page indexes (ColumnIndex/OffsetIndex) written by pyarrow — an
independent reference implementation — parsed by the repo's thrift
walker, and page-pruned ranged scans returning exactly what a full
scan filtered post-hoc returns."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shared_etl_pipelines_spark.sources.parquet_footer import (
    parse_parquet_footer,
)
from shared_etl_pipelines_spark.sources.parquet_pageindex import (
    read_all_pruned,
    read_column_pruned,
    read_page_indexes,
)


def _fixture(tmp_path, compression="snappy", use_dictionary=True):
    n = 50000
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array(
                [None if i % 97 == 0 else f"v{i % 100:04d}" for i in range(n)]
            ),
        }
    )
    p = str(tmp_path / f"pi_{compression}_{use_dictionary}.parquet")
    pq.write_table(
        t, p, row_group_size=20000, data_page_size=4096,
        write_page_index=True, compression=compression,
        use_dictionary=use_dictionary,
    )
    return p, n


def test_page_index_parse_matches_data(tmp_path):
    p, n = _fixture(tmp_path)
    foot = parse_parquet_footer(open(p, "rb").read())
    idx = read_page_indexes(p, foot, 0, "k")
    pages = idx["pages"]
    assert len(pages) > 3  # 4 KiB pages over 20k rows
    assert pages[0]["first_row"] == 0 and pages[0]["min"] == 0
    # k is sorted: every page's min == its first_row, max < next first_row
    for a, b in zip(pages, pages[1:]):
        assert a["min"] == a["first_row"]
        assert a["max"] == b["first_row"] - 1
    assert idx["boundary_order"] == 1  # ASCENDING
    # null_pages is a true bool LIST (the thrift list<bool> fix)
    sidx = read_page_indexes(p, foot, 0, "s")
    assert all(isinstance(pg["null_page"], bool) for pg in sidx["pages"])
    assert all(pg["null_count"] > 0 for pg in sidx["pages"])  # i%97 nulls


def test_pruned_scan_equals_filtered_full_scan(tmp_path):
    for comp, dic in (("snappy", True), ("none", False), ("zstd", True)):
        p, n = _fixture(tmp_path, comp, dic)
        vals, total, read = read_all_pruned(p, "k", 41000, 41500)
        assert read < total  # pruning engaged
        got = sorted(v for _, v in vals if 41000 <= v <= 41500)
        assert got == list(range(41000, 41501))
        # row indexes align with values (k == its global row index)
        assert all(r == v for r, v in vals)


def test_dictionary_column_prunes_and_decodes(tmp_path):
    # cluster the strings so page min/max actually separate
    n = 30000
    t = pa.table({"s": pa.array([f"g{i // 300:04d}" for i in range(n)])})
    p = str(tmp_path / "dictstr.parquet")
    pq.write_table(t, p, row_group_size=n, data_page_size=2048,
                   write_page_index=True, write_batch_size=512)
    vals, total, read = read_all_pruned(p, "s", "g0040", "g0041")
    assert read < total
    got = {v for _, v in vals}
    assert b"g0040" in got and b"g0041" in got
    want_rows = {i for i in range(n) if 40 <= i // 300 <= 41}
    assert want_rows <= {r for r, v in vals}


def test_refuses_without_page_index(tmp_path):
    t = pa.table({"k": pa.array(range(100), pa.int64())})
    p = str(tmp_path / "noidx.parquet")
    pq.write_table(t, p, write_page_index=False)
    foot = parse_parquet_footer(open(p, "rb").read())
    with pytest.raises(ValueError, match="no page index"):
        read_column_pruned(p, foot, 0, "k", 0, 10)


def test_row_span_companion_fetch(tmp_path):
    p, n = _fixture(tmp_path)
    from shared_etl_pipelines_spark.sources.parquet_pageindex import (
        read_column_rows,
    )

    foot = parse_parquet_footer(open(p, "rb").read())
    vals, total, read = read_column_rows(p, foot, 0, "k", 7000, 7400)
    assert read < total  # only the pages covering rows 7000-7400
    got = {r: v for r, v in vals}
    for r in range(7000, 7401):
        assert got[r] == r
