"""Own-bytes Arrow IPC stream writer: hand-built flatbuffers must
survive pyarrow's verifier AND read back value-identically, plus the
repo's own reader."""

import io
import random

import pyarrow.ipc as ipc
import pytest

from shared_etl_pipelines_spark.sources.arrow_ipc import read_ipc
from shared_etl_pipelines_spark.sources.arrow_ipc_write import (
    write_ipc_stream,
)


def test_reference_reader_cross_check():
    rng = random.Random(8)
    for trial in range(8):
        n = rng.randrange(0, 1500)
        ints = [rng.randrange(-10**12, 10**12) if rng.random() > 0.2
                else None for _ in range(n)]
        dbls = [rng.random() if rng.random() > 0.1 else None
                for _ in range(n)]
        strs = ["sé" + str(rng.randrange(100)) if rng.random() > 0.15
                else None for _ in range(n)]
        bools = [rng.random() > 0.5 if rng.random() > 0.1 else None
                 for _ in range(n)]
        blob = write_ipc_stream(
            [("i", "int64", ints), ("d", "double", dbls),
             ("s", "utf8", strs), ("b", "bool", bools)],
            batch_size=rng.choice([7, 64, 1 << 20]),
        )
        ref = ipc.open_stream(io.BytesIO(blob)).read_all()
        for c, exp in (("i", ints), ("d", dbls), ("s", strs), ("b", bools)):
            assert ref.column(c).to_pylist() == exp, (trial, c)
        assert read_ipc(blob)["columns"]["i"] == ints  # self-read


def test_alignment_is_verifier_clean():
    """The exact regression: pyarrow's flatbuffers verifier rejects
    buffers whose total length breaks start-anchored scalar alignment.
    Odd-length names exercise every padding path."""
    for name in ("a", "ab", "abc", "abcd", "abcde"):
        blob = write_ipc_stream([(name, "int64", [1, 2, 3])])
        ref = ipc.open_stream(io.BytesIO(blob)).read_all()
        assert ref.column(name).to_pylist() == [1, 2, 3]


def test_refusals():
    with pytest.raises(ValueError, match="ragged"):
        write_ipc_stream([("x", "int64", [1]), ("y", "int64", [1, 2])])
    with pytest.raises(ValueError, match="unsupported"):
        write_ipc_stream([("x", "date", [1])])


def test_compressed_emission_read_by_pyarrow_and_own():
    """compression='lz4'/'zstd': buffers carry the spec prefix + frames
    from the repo's OWN compressors; pyarrow's reference reader and the
    own reader both decode them."""
    import pyarrow.ipc as ipc

    from shared_etl_pipelines_spark.sources.arrow_ipc import read_ipc

    cols = [
        ("k", "int64", [None if i % 9 == 0 else i * 3 for i in range(4000)]),
        ("s", "utf8", [f"row{i % 40}" for i in range(4000)]),
        ("f", "double", [i / 7 for i in range(4000)]),
        ("b", "bool", [i % 3 == 0 for i in range(4000)]),
    ]
    for comp in ("zstd", "lz4"):
        blob = write_ipc_stream(cols, batch_size=900, compression=comp)
        t = ipc.open_stream(io.BytesIO(blob)).read_all()
        got = read_ipc(blob)
        for name, _k, vals in cols:
            assert t.column(name).to_pylist() == vals, (comp, name)
            assert got["columns"][name] == vals, (comp, name)
    with pytest.raises(ValueError, match="compression"):
        write_ipc_stream(cols, compression="brotli")
