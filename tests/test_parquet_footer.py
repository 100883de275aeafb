"""Thrift compact protocol + parquet footer walker: cross-checked
against pyarrow's writer AND metadata API (independent implementation),
plus refusal paths."""

import io
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shared_etl_pipelines_spark.sources.parquet_footer import (
    parse_parquet_footer,
)
from shared_etl_pipelines_spark.sources.thrift_compact import decode_struct


def test_footer_cross_check_against_pyarrow_metadata():
    rng = random.Random(3)
    for _ in range(5):
        n = rng.randrange(10, 400)
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "val": pa.array([rng.random() for _ in range(n)], pa.float64()),
                "name": pa.array([f"d{i}" for i in range(n)], pa.string()),
            }
        )
        buf = io.BytesIO()
        codec = rng.choice(["snappy", "zstd", "none", "gzip", "lz4"])
        pq.write_table(tbl, buf, compression=codec, row_group_size=max(10, n // 3))
        blob = buf.getvalue()
        ours = parse_parquet_footer(blob)
        ref = pq.read_metadata(io.BytesIO(blob))
        assert ours["num_rows"] == ref.num_rows
        assert len(ours["row_groups"]) == ref.num_row_groups
        for gi in range(ref.num_row_groups):
            rg_ref, rg = ref.row_group(gi), ours["row_groups"][gi]
            assert rg["num_rows"] == rg_ref.num_rows
            for ci in range(rg_ref.num_columns):
                c_ref, c = rg_ref.column(ci), rg["columns"][ci]
                assert c["path"] == c_ref.path_in_schema
                # pyarrow's API reports the LZ4_RAW id (7) as "LZ4"
                want = {"LZ4": {"LZ4", "LZ4_RAW"}}.get(
                    c_ref.compression, {c_ref.compression}
                )
                assert c["codec"] in want
                assert c["num_values"] == c_ref.num_values
                st = c_ref.statistics
                if st is not None and st.has_min_max and c["path"] != "val":
                    assert c["stats"]["min"] == st.min
                    assert c["stats"]["max"] == st.max


def test_thrift_struct_decoding_units():
    # hand-built compact struct: field 1 i32 = -3, field 2 bool true,
    # field 4 binary "ab" (delta 2), nested struct in field 5
    inner = bytes([0x15, 0x08, 0x00])  # field 1 i32 zigzag(4)=8, STOP
    buf = bytes(
        [0x15, 0x05]  # field 1, i32, zigzag(-3)=5
        + [0x11]  # field 2, bool true folded
        + [0x28, 0x02] + list(b"ab")  # field 4 (delta 2), binary len 2
        + [0x1C]  # field 5 (delta 1), struct
    ) + inner + bytes([0x00])
    fields, p = decode_struct(buf)
    assert fields[1] == -3 and fields[2] is True and fields[4] == b"ab"
    assert fields[5] == {1: 4} and p == len(buf)


def test_refusals():
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(b"PAR1" + b"\x00" * 10 + b"XXXX")
    tbl = pa.table({"v": pa.array([1, 2], pa.int64())})
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    blob = bytearray(buf.getvalue())
    # footer-length lie: points past the file head
    struct.pack_into("<I", blob, len(blob) - 8, len(blob))
    with pytest.raises(ValueError, match="overruns"):
        parse_parquet_footer(bytes(blob))
    with pytest.raises(ValueError, match="truncated|STOP"):
        decode_struct(bytes([0x15]))


# ---------------------------------------------------------------------------
# data pages (sources/parquet_pages.py)
# ---------------------------------------------------------------------------


def test_page_read_cross_check_matrix():
    """Full column read vs pyarrow's reader: 5 codecs x dict/plain x
    page v1/v2 x 6 physical types with nulls."""
    from shared_etl_pipelines_spark.sources.parquet_pages import (
        read_all_columns,
    )

    rng = random.Random(17)
    for trial in range(12):
        n = rng.randrange(1, 500)
        ints = [rng.randrange(-10**6, 10**6) if rng.random() > 0.2 else None
                for _ in range(n)]
        strs = [rng.choice(["aa", "bb", "ccc"]) if rng.random() > 0.15
                else None for _ in range(n)]
        bools = [rng.random() > 0.5 if rng.random() > 0.1 else None
                 for _ in range(n)]
        tbl = pa.table(
            {
                "i": pa.array(ints, pa.int64()),
                "s": pa.array(strs, pa.string()),
                "b": pa.array(bools, pa.bool_()),
                "d": pa.array(
                    [None if x is None else x / 8 for x in ints], pa.float64()
                ),
            }
        )
        buf = io.BytesIO()
        pq.write_table(
            tbl, buf,
            compression=rng.choice(["snappy", "zstd", "none", "gzip", "lz4"]),
            use_dictionary=rng.random() > 0.5,
            data_page_version=rng.choice(["1.0", "2.0"]),
            row_group_size=max(8, n // 3),
        )
        blob = buf.getvalue()
        ref = pq.read_table(io.BytesIO(blob))
        for c in ("i", "s", "b", "d"):
            got = read_all_columns(blob, c)
            if c == "s":
                got = [g.decode() if g is not None else None for g in got]
            assert got == ref.column(c).to_pylist(), (trial, c)


def test_page_read_refusals():
    from shared_etl_pipelines_spark.sources.parquet_pages import (
        read_all_columns,
    )

    tbl = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    blob = buf.getvalue()
    with pytest.raises(ValueError, match="no column"):
        read_all_columns(blob, "missing")
    # repeated (list) fields refuse
    lt = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    b2 = io.BytesIO()
    pq.write_table(lt, b2)
    with pytest.raises(ValueError):
        read_all_columns(b2.getvalue(), "l.list.element")


def test_delta_and_byte_stream_split_encodings():
    from shared_etl_pipelines_spark.sources.parquet_pages import (
        read_all_columns,
    )

    rng = random.Random(23)
    for trial in range(6):
        n = rng.randrange(1, 700)
        ints = [rng.randrange(-10**9, 10**9) if rng.random() > 0.2 else None
                for _ in range(n)]
        f64 = [rng.random() if rng.random() > 0.1 else None for _ in range(n)]
        strs = ["pre" + str(rng.randrange(40)) if rng.random() > 0.15
                else None for _ in range(n)]
        tbl = pa.table(
            {
                "i": pa.array(ints, pa.int64()),
                "f": pa.array(f64, pa.float64()),
                "s": pa.array(strs, pa.string()),
            }
        )
        buf = io.BytesIO()
        pq.write_table(
            tbl, buf, use_dictionary=False,
            compression=rng.choice(["snappy", "zstd", "none"]),
            data_page_version=rng.choice(["1.0", "2.0"]),
            row_group_size=max(8, n // 2),
            column_encoding={
                "i": "DELTA_BINARY_PACKED",
                "f": "BYTE_STREAM_SPLIT",
                "s": rng.choice(
                    ["DELTA_LENGTH_BYTE_ARRAY", "DELTA_BYTE_ARRAY"]
                ),
            },
        )
        blob = buf.getvalue()
        ref = pq.read_table(io.BytesIO(blob))
        for c in ("i", "f", "s"):
            got = read_all_columns(blob, c)
            if c == "s":
                got = [g.decode() if g is not None else None for g in got]
            assert got == ref.column(c).to_pylist(), (trial, c)


def test_ranged_reads_match_full_file_reads(tmp_path):
    # the scan path a distributed task uses: footer via two tail reads,
    # each column chunk via one seek to its byte span — values must be
    # identical to the whole-blob reader
    from shared_etl_pipelines_spark.sources.parquet_footer import (
        read_footer_ranged,
    )
    from shared_etl_pipelines_spark.sources.parquet_pages import (
        read_column,
        read_column_ranged,
    )

    rng = random.Random(7)
    n = 500
    tbl = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "v": pa.array(
                [rng.random() if i % 9 else None for i in range(n)],
                pa.float64(),
            ),
            "s": pa.array([f"row{i}" for i in range(n)], pa.string()),
        }
    )
    path = str(tmp_path / "t.parquet")
    pq.write_table(tbl, path, compression="snappy", row_group_size=128)
    blob = open(path, "rb").read()
    foot = read_footer_ranged(path)
    assert foot["num_rows"] == n
    assert foot == parse_parquet_footer(blob)
    for rg in range(len(foot["row_groups"])):
        for col in ("k", "v", "s"):
            assert read_column_ranged(path, foot, rg, col) == read_column(
                blob, rg, col
            )


def test_ranged_footer_refusals(tmp_path):
    from shared_etl_pipelines_spark.sources.parquet_footer import (
        read_footer_ranged,
    )

    p = tmp_path / "bad.parquet"
    p.write_bytes(b"PAR1tiny")
    with pytest.raises(ValueError, match="quarantine"):
        read_footer_ranged(str(p))
    p.write_bytes(b"PAR1" + b"\x00" * 20 + struct.pack("<I", 999) + b"PAR1")
    with pytest.raises(ValueError, match="overruns"):
        read_footer_ranged(str(p))
