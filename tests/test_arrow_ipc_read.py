"""Independent Arrow IPC reader: flatbuffers walk + batch decode
cross-checked against pyarrow for both framings, plus refusals."""

import io
import random

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from shared_etl_pipelines_spark.sources.arrow_ipc import ipc_schema, read_ipc


def _write(tbl, use_file, chunk):
    buf = io.BytesIO()
    maker = ipc.new_file if use_file else ipc.new_stream
    with maker(buf, tbl.schema) as w:
        for b in tbl.to_batches(max_chunksize=chunk):
            w.write_batch(b)
    return buf.getvalue()


def test_cross_implementation_both_framings():
    rng = random.Random(31)
    for trial in range(8):
        n = rng.randrange(1, 1500)
        tbl = pa.table(
            {
                "i": pa.array(
                    [rng.randrange(-10**9, 10**9) if rng.random() > 0.2
                     else None for _ in range(n)], pa.int64()),
                "u": pa.array(
                    [rng.randrange(65536) if rng.random() > 0.1 else None
                     for _ in range(n)], pa.uint16()),
                "d": pa.array(
                    [rng.random() if rng.random() > 0.1 else None
                     for _ in range(n)], pa.float64()),
                "s": pa.array(
                    [rng.choice(["aa", "bé", "ccc"]) if rng.random() > 0.15
                     else None for _ in range(n)], pa.string()),
                "b": pa.array(
                    [rng.random() > 0.5 if rng.random() > 0.1 else None
                     for _ in range(n)], pa.bool_()),
            }
        )
        blob = _write(tbl, trial % 2 == 0, max(16, n // 3))
        got = read_ipc(blob)
        assert got["n_batches"] >= 1
        for c in ("i", "u", "d", "s", "b"):
            assert got["columns"][c] == tbl.column(c).to_pylist(), (trial, c)


def test_schema_decode():
    tbl = pa.table({"x": pa.array([1], pa.int32()),
                    "y": pa.array([1.0], pa.float32())})
    fields = ipc_schema(_write(tbl, True, 10))
    assert fields[0] == {"name": "x", "nullable": True, "type": "int",
                         "bits": 32, "signed": True}
    assert fields[1]["type"] == "float" and fields[1]["bits"] == 32


def test_refusals():
    with pytest.raises(ValueError, match="continuation|magic|schema"):
        read_ipc(b"ARROW1\x00\x00" + b"\x00" * 20 + b"ARROW1")
    # nested types refuse
    tbl = pa.table({"l": pa.array([[1, 2]], pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="nested|unsupported"):
        read_ipc(_write(tbl, True, 10))
    # dictionary-encoded fields refuse
    dt = pa.table({"c": pa.array(["a", "b", "a"]).dictionary_encode()})
    with pytest.raises(ValueError, match="dictionary"):
        read_ipc(_write(dt, True, 10))


def test_compressed_bodies_both_codecs_and_framings():
    """pyarrow-compressed IPC (BodyCompression, BUFFER method) decodes
    through the repo's OWN lz4-frame / zstd decompressors."""
    import pyarrow.ipc as ipc

    t = pa.table(
        {
            "k": pa.array(
                [None if i % 9 == 0 else i for i in range(5000)], pa.int64()
            ),
            "s": pa.array([f"row{i % 40}" for i in range(5000)]),
            "f": pa.array([i / 7 for i in range(5000)], pa.float64()),
        }
    )
    for codec in ("zstd", "lz4"):
        opts = ipc.IpcWriteOptions(compression=codec)
        for factory in (ipc.new_stream, ipc.new_file):
            sink = io.BytesIO()
            with factory(sink, t.schema, options=opts) as w:
                w.write_table(t, max_chunksize=1000)
            got = read_ipc(sink.getvalue())
            for name in ("k", "s", "f"):
                assert got["columns"][name] == t.column(name).to_pylist()


def test_compressed_buffer_prefix_lie_quarantines():
    import pyarrow.ipc as ipc

    t = pa.table({"k": pa.array(range(1000), pa.int64())})
    sink = io.BytesIO()
    with ipc.new_stream(
        sink, t.schema, options=ipc.IpcWriteOptions(compression="zstd")
    ) as w:
        w.write_table(t)
    blob = bytearray(sink.getvalue())
    # corrupt one byte in the compressed body region (after the schema
    # message); the zstd checksum or the size prefix must catch it
    blob[-20] ^= 0xFF
    with pytest.raises(ValueError):
        read_ipc(bytes(blob))
