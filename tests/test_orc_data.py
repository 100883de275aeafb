"""ORC stripe data decode: cross-implementation matrix against
pyarrow's bundled reference ORC writer, RLEv2 sub-encoding units, and
refusals."""

import io
import random
import struct

import pyarrow as pa
import pytest
from pyarrow import orc as pa_orc

from shared_etl_pipelines_spark.sources.orc_data import (
    _byte_rle,
    _rlev2,
    read_orc_column,
)


def test_cross_implementation_matrix():
    rng = random.Random(41)
    for trial in range(8):
        n = rng.randrange(1, 3000)
        ints = [rng.randrange(-10**9, 10**9) if rng.random() > 0.2 else None
                for _ in range(n)]
        mono = [i * 3 + rng.randrange(3) for i in range(n)]  # DELTA lane
        dbls = [rng.random() if rng.random() > 0.1 else None for _ in range(n)]
        strs = [rng.choice(["aa", "bb", "cc"]) + str(rng.randrange(8))
                if rng.random() > 0.15 else None for _ in range(n)]
        bools = [rng.random() > 0.5 if rng.random() > 0.1 else None
                 for _ in range(n)]
        tbl = pa.table(
            {
                "i": pa.array(ints, pa.int64()),
                "m": pa.array(mono, pa.int64()),
                "d": pa.array(dbls, pa.float64()),
                "s": pa.array(strs, pa.string()),
                "b": pa.array(bools, pa.bool_()),
            }
        )
        buf = io.BytesIO()
        comp = rng.choice(["uncompressed", "zlib", "snappy", "lz4", "zstd"])
        pa_orc.write_table(tbl, buf, compression=comp)
        blob = buf.getvalue()
        ref = pa_orc.read_table(io.BytesIO(blob))
        for c in ("i", "m", "d", "s", "b"):
            assert read_orc_column(blob, c) == ref.column(c).to_pylist(), (
                trial, c, comp,
            )


def test_rlev2_sub_encoding_units():
    # SHORT_REPEAT: width 1 byte, count 3+2, value 7 (unsigned)
    assert _rlev2(bytes([0x02, 7]), signed=False) == [7] * 5
    # DELTA with width 0 (fixed delta): base 2, delta +3, length 4
    blob = bytes([0xC0 | 0, 3, 4, 6])  # hdr(len-1=3), base zz(2)=4, delta zz(3)=6
    assert _rlev2(blob, signed=True) == [2, 5, 8, 11]
    # DIRECT: width code 1 -> 2 bits, length 4: values 3,0,2,1
    direct = bytes([0x40 | (1 << 1), 3, 0b11001001])
    assert _rlev2(direct, signed=False) == [3, 0, 2, 1]


def test_byte_rle_runs_and_literals():
    assert _byte_rle(bytes([0, 0xAA])) == b"\xaa" * 3
    assert _byte_rle(bytes([253, 1, 2, 3])) == b"\x01\x02\x03"


def test_refusals():
    tbl = pa.table({"v": pa.array([1, 2], pa.int64())})
    buf = io.BytesIO()
    pa_orc.write_table(tbl, buf)
    blob = buf.getvalue()
    with pytest.raises(ValueError, match="no column"):
        read_orc_column(blob, "missing")
    ts = pa.table({"t": pa.array([[1, 2]], pa.list_(pa.int64()))})
    b2 = io.BytesIO()
    pa_orc.write_table(ts, b2)
    with pytest.raises(ValueError, match="unsupported"):
        read_orc_column(b2.getvalue(), "t")
