"""Own-bytes ORC writer: pyarrow's reference reader + the repo's own
reader both re-read our streams value-identically."""

import io
import random

import pyarrow as pa  # noqa: F401
import pytest
from pyarrow import orc as pa_orc

from shared_etl_pipelines_spark.sources.orc_data import read_orc_column
from shared_etl_pipelines_spark.sources.orc_write import write_orc_data


def test_reference_reader_cross_check():
    rng = random.Random(13)
    for trial in range(8):
        n = rng.randrange(0, 2500)
        ints = [rng.randrange(-10**12, 10**12) if rng.random() > 0.2
                else None for _ in range(n)]
        dbls = [rng.random() if rng.random() > 0.1 else None
                for _ in range(n)]
        strs = ["s" + str(rng.randrange(100)) if rng.random() > 0.15
                else None for _ in range(n)]
        bools = [rng.random() > 0.5 if rng.random() > 0.1 else None
                 for _ in range(n)]
        comp = rng.choice(["NONE", "ZLIB", "SNAPPY"])
        blob = write_orc_data(
            [("i", "long", ints), ("d", "double", dbls),
             ("s", "utf8", strs), ("b", "boolean", bools)],
            compression=comp,
        )
        ref = pa_orc.read_table(io.BytesIO(blob))
        for c, exp in (("i", ints), ("d", dbls), ("s", strs), ("b", bools)):
            assert ref.column(c).to_pylist() == exp, (trial, c, comp)
        assert read_orc_column(blob, "i") == ints  # self-read
        assert read_orc_column(blob, "s") == strs


def test_refusals():
    with pytest.raises(ValueError, match="codec"):
        write_orc_data([("x", "long", [1])], compression="BROTLI")
    with pytest.raises(ValueError, match="ragged"):
        write_orc_data([("x", "long", [1]), ("y", "long", [1, 2])])
    with pytest.raises(ValueError, match="unsupported"):
        write_orc_data([("x", "decimal", [1])])


def test_zstd_compression_cross_readers():
    """ZSTD ORC chunks framed around the repo's own store-mode zstd
    frames: pyarrow's bundled ORC C++ reader and the own reader both
    decode them."""
    import io

    import pyarrow.orc as po

    from shared_etl_pipelines_spark.sources.orc_data import read_orc_column
    from shared_etl_pipelines_spark.sources.orc_write import write_orc_data

    cols = [
        ("k", "long", [None if i % 9 == 0 else i * 3 for i in range(5000)]),
        ("s", "utf8", [f"row{i % 40}" for i in range(5000)]),
    ]
    blob = write_orc_data(cols, compression="ZSTD")
    t = po.read_table(io.BytesIO(blob))
    assert t.column("k").to_pylist() == cols[0][2]
    assert t.column("s").to_pylist() == cols[1][2]
    assert read_orc_column(blob, "k") == cols[0][2]
