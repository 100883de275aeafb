"""zstd frame WRITER (store mode): every frame must decode identically
through pyarrow's bundled reference zstd AND the repo's own RFC 8878
decoder — two independent decoders over the same bytes."""

import io
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shared_etl_pipelines_spark.sources.zstd_decode import zstd_decompress
from shared_etl_pipelines_spark.sources.zstd_encode import zstd_compress


def test_cross_decoder_matrix():
    rng = random.Random(5)
    c = pa.Codec("zstd")
    cases = [
        b"",
        b"a",
        b"x" * 100_000,  # one giant run -> RLE blocks
        bytes(rng.randrange(256) for _ in range(300_000)),  # incompressible
        b"head" + b"\x00" * 5000 + b"tail" * 1000 + b"Q" * 70,  # mixed
        bytes(rng.randrange(4) for _ in range(200)) * 2000,
        b"\x00" * (128 * 1024 * 3 + 17),  # runs past the block cap
    ]
    for i, data in enumerate(cases):
        frame = zstd_compress(data)
        assert c.decompress(frame, len(data)).to_pybytes() == data, i
        assert zstd_decompress(frame) == data, i


def test_checksum_and_fcs_guard_corruption():
    data = b"corpus shard " * 500
    frame = bytearray(zstd_compress(data))
    frame[-6] ^= 0xFF  # flip a payload byte near the tail
    with pytest.raises(ValueError, match="checksum|lies"):
        zstd_decompress(bytes(frame))


def test_rle_runs_shrink_frames():
    dense = b"\x00" * 500_000
    assert len(zstd_compress(dense)) < 64


def test_own_parquet_writer_zstd_codec(tmp_path):
    import duckdb

    from shared_etl_pipelines_spark.sources.parquet_write import write_parquet

    cols = [
        ("k", "int64", list(range(1000))),
        ("v", "double", [None if i % 9 == 0 else i / 8 for i in range(1000)]),
        ("s", "utf8", [f"doc{i % 5}" for i in range(1000)]),
    ]
    blob = write_parquet(cols, compression="ZSTD", row_group_size=256)
    t = pq.read_table(io.BytesIO(blob))
    for name, _kind, vals in cols:
        assert t.column(name).to_pylist() == vals
    p = tmp_path / "z.parquet"
    p.write_bytes(blob)
    n, nulls = duckdb.sql(
        f"SELECT COUNT(*), COUNT(*) FILTER (v IS NULL) FROM '{p}'"
    ).fetchone()
    assert (n, nulls) == (1000, sum(1 for x in cols[1][2] if x is None))
    # the repo's own reader closes the loop
    from shared_etl_pipelines_spark.sources.parquet_pages import read_all_columns

    assert read_all_columns(blob, "k") == cols[0][2]
    assert read_all_columns(blob, "v") == cols[1][2]


def test_matched_frames_cross_decoder_matrix():
    """matches=True (VERDICT r12 task #6): predefined-FSE compressed
    blocks — every frame decodes identically through pyarrow's bundled
    reference zstd AND the repo's own decoder, and compressible shapes
    actually shrink."""
    rng = random.Random(11)
    c = pa.Codec("zstd")
    cases = [
        b"",
        b"abcabcabcabcabcabcX" * 50,
        b"the quick brown fox jumps " * 3000,
        bytes(rng.randrange(4) for _ in range(100)) * 500,
        bytes(rng.randrange(256) for _ in range(40000)),  # incompressible
        b"\x00" * 300000,  # runs -> still store/RLE path inside
        bytes(rng.randrange(3) for _ in range(400000)),  # multi-block
        b"json:{\"key\": 1, \"key\": 2}" * 8000,
    ]
    for i, data in enumerate(cases):
        frame = zstd_compress(data, matches=True)
        assert c.decompress(frame, len(data)).to_pybytes() == data, i
        assert zstd_decompress(frame) == data, i
        # never worse than the store rendering
        assert len(frame) <= len(zstd_compress(data)), i
    # ratio is real on the repetitive shapes
    rep = b"the quick brown fox jumps " * 3000
    assert len(zstd_compress(rep, matches=True)) < len(rep) // 100


def test_matched_fuzz_small():
    rng = random.Random(23)
    c = pa.Codec("zstd")
    for _ in range(300):
        n = rng.randrange(0, 2000)
        data = bytes(rng.randrange(rng.choice((2, 4, 17, 256))) for _ in range(n))
        frame = zstd_compress(data, matches=True)
        assert zstd_decompress(frame) == data
        assert c.decompress(frame, len(data)).to_pybytes() == data


def test_zstd_matches_wired_into_parquet_and_orc():
    """The option rides write_parquet(zstd_matches=True) and
    write_orc_data(zstd_matches=True): pyarrow re-reads both, and the
    parquet file gets smaller on repetitive data."""
    from shared_etl_pipelines_spark.sources.orc_write import write_orc_data
    from shared_etl_pipelines_spark.sources.parquet_write import write_parquet
    import pyarrow.orc as _orc

    vals = [f"tag-{i % 3}-payload-payload" for i in range(5000)]
    pq_store = write_parquet([("s", "utf8", vals)], compression="ZSTD")
    pq_match = write_parquet(
        [("s", "utf8", vals)], compression="ZSTD", zstd_matches=True
    )
    assert pq.read_table(io.BytesIO(pq_match)).column("s").to_pylist() == vals
    assert len(pq_match) < len(pq_store)
    orc_match = write_orc_data(
        [("s", "utf8", vals)], compression="ZSTD", zstd_matches=True
    )
    t = _orc.ORCFile(io.BytesIO(orc_match)).read()
    assert t.column("s").to_pylist() == vals


def test_huffman_literals_engage_and_cross_decode():
    """r13: Huffman-compressed literals (single-stream, direct 4-bit
    weights, canonical construction mirroring the decoder) engage on
    skewed histograms — including the literals-only compressed block
    with zero sequences — and every frame still decodes through both
    pyarrow and the own decoder."""
    rng = random.Random(9)
    c = pa.Codec("zstd")
    skew = bytes(rng.choice(b"etaoinshrdlucmf") for _ in range(900))
    frame = zstd_compress(skew, matches=True)
    assert len(frame) < len(skew) * 2 // 3  # entropy win without matches
    assert zstd_decompress(frame) == skew
    assert c.decompress(frame, len(skew)).to_pybytes() == skew
    # >128 distinct byte values: direct weights out of range -> raw
    wide = bytes(rng.randrange(256) for _ in range(800))
    fw = zstd_compress(wide, matches=True)
    assert zstd_decompress(fw) == wide
    assert c.decompress(fw, len(wide)).to_pybytes() == wide


def test_custom_fse_distributions_and_rle_tables():
    """r13: sequence streams pick their table mode per block — RLE for
    constant code streams, custom FSE distributions (normalized block
    histogram shipped in the spec's table description) when sequences
    amortize it, predefined otherwise. The distribution writer is a
    bit-for-bit mirror of the reader, and both decoders accept every
    frame."""
    from shared_etl_pipelines_spark.sources.zstd_decode import (
        _fse_read_distribution,
    )
    from shared_etl_pipelines_spark.sources.zstd_encode import (
        _fse_write_distribution,
        _normalize_counts,
    )

    rng = random.Random(2)
    for _ in range(100):
        nsym = rng.randrange(2, 30)
        freq = {s: rng.randrange(1, 500)
                for s in rng.sample(range(30), nsym)}
        acc = max(6, (nsym - 1).bit_length())
        counts = _normalize_counts(freq, acc)
        blob = _fse_write_distribution(counts, acc)
        got, gacc, _p = _fse_read_distribution(blob, 0, 52)
        assert gacc == acc and got == counts[: len(got)]
        assert sum(counts[len(got):]) == 0

    c = pa.Codec("zstd")
    # constant-offset repetitions -> RLE offset table; varied lengths
    # -> custom LL/ML tables
    d = (b"A" * 17 + b"B" * 9 + b"kkkk") * 900
    frame = zstd_compress(d, matches=True)
    assert zstd_decompress(frame) == d
    assert c.decompress(frame, len(d)).to_pybytes() == d
    assert len(frame) < 100
