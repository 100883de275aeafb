"""Zarr v2 store: metadata validation, chunk-grid pruning planner,
chunk decode (zlib/gzip/raw, fill_value), and the distributed scan."""

import os
import struct
import zlib

import pytest

from shared_etl_pipelines_spark.sources import zarrstore as Z


def _arr(tmp_path, **kw):
    d = str(tmp_path / "arr")
    Z.write_demo_zarr(
        d, (50, 70), (16, 32), lambda r, c: (r * 7 + c * 3) % 11 + 0.25,
        missing={"1.1"}, **kw,
    )
    return d


def test_metadata_and_grid(tmp_path):
    d = _arr(tmp_path)
    meta = Z.read_zarray(d)
    assert meta["grid"] == [4, 3]
    assert meta["compressor"]["id"] == "zlib"


def test_prune_planner_is_pure_metadata(tmp_path):
    meta = Z.read_zarray(_arr(tmp_path))
    assert Z.chunks_for_bbox(meta, [0, 0], [1, 1]) == ["0.0"]
    assert sorted(Z.chunks_for_bbox(meta, [10, 30], [20, 40])) == [
        "0.0", "0.1", "1.0", "1.1",
    ]
    assert Z.chunks_for_bbox(meta, [49, 69], [50, 70]) == ["3.2"]
    # boxes outside the array plan nothing (clamped, not an error)
    assert Z.chunks_for_bbox(meta, [50, 0], [60, 10]) == []
    assert Z.chunks_for_bbox(meta, [0, 0], [0, 5]) == []


def test_chunk_decode_and_fill_value(tmp_path):
    d = _arr(tmp_path)
    meta = Z.read_zarray(d)
    vals = Z.decode_chunk(meta, "0.0", open(os.path.join(d, "0.0"), "rb").read())
    assert vals[0] == 0.25 and vals[1] == 3.25  # (0,0) and (0,1)
    assert Z.decode_chunk(meta, "1.1", None) == [0.0] * (16 * 32)


def test_gzip_wrapper_and_raw_chunks(tmp_path):
    meta = {
        "zarr_format": 2, "shape": [1, 4], "chunks": [1, 4],
        "dtype": "<f8", "order": "C", "fill_value": 0.0,
        "compressor": {"id": "gzip", "level": 5}, "grid": [1, 1],
    }
    raw = struct.pack("<4d", 1, 2, 3, 4)
    co = zlib.compressobj(5, zlib.DEFLATED, 31)
    assert Z.decode_chunk(meta, "0.0", co.compress(raw) + co.flush()) == [
        1.0, 2.0, 3.0, 4.0,
    ]
    meta["compressor"] = None
    assert Z.decode_chunk(meta, "0.0", raw) == [1.0, 2.0, 3.0, 4.0]


def test_refusals(tmp_path):
    d = _arr(tmp_path)
    meta = Z.read_zarray(d)
    import json

    m = json.load(open(os.path.join(d, ".zarray")))
    for patch, msg in (
        ({"order": "F"}, "C order"),
        ({"compressor": {"id": "blosc"}}, "compressor"),
        ({"dtype": ">f8"}, "dtype"),
        ({"zarr_format": 3}, "format"),
        ({"filters": [{"id": "delta"}]}, "filters"),
    ):
        bad = dict(m, **patch)
        e = str(tmp_path / "bad")
        os.makedirs(e, exist_ok=True)
        json.dump(bad, open(os.path.join(e, ".zarray"), "w"))
        with pytest.raises(ValueError, match=msg):
            Z.read_zarray(e)
    # short chunk refuses
    with pytest.raises(ValueError, match="bytes"):
        Z.decode_chunk(meta, "0.0", zlib.compress(b"\x00" * 8))


def test_distributed_scan_with_and_without_bbox(spark, tmp_path):
    d = _arr(tmp_path)
    cells = Z.scan_zarr(spark, d).collect()
    assert len(cells) == 50 * 70
    exp = sum(
        (r * 7 + c * 3) % 11 + 0.25
        for r in range(50) for c in range(70)
        if not (16 <= r < 32 and 32 <= c < 64)
    )
    assert abs(sum(r["value"] for r in cells) - exp) < 1e-9
    # bbox prunes FILES; surviving chunks emit whole (parquet row-group
    # stats contract): one chunk -> full 16x32 cell window
    boxed = Z.scan_zarr(spark, d, bbox=([0, 0], [1, 1])).collect()
    assert len(boxed) == 16 * 32


def test_datasource_plans_only_surviving_chunks(spark, tmp_path):
    """The native DataSource's partition plan IS the pruned chunk list:
    a bbox covering 4 chunks yields exactly 4 input partitions."""
    from shared_etl_pipelines_spark.sources.zarr_datasource import (
        ZarrDataSource,
        ZarrReader,
    )

    d = _arr(tmp_path)
    reader = ZarrReader({"path": d, "bbox": "16,16,48,48"})
    parts = reader.partitions()
    assert sorted(p.key for p in parts) == ["1.0", "1.1", "2.0", "2.1"]
    # and the full read through Spark matches the exact cell filter
    spark.dataSource.register(ZarrDataSource)
    got = (
        spark.read.format("zarr").option("path", d)
        .option("bbox", "16,16,48,48").load().collect()
    )
    exp = sum(
        (r * 7 + c * 3) % 11 + 0.25
        for r in range(16, 48) for c in range(16, 48)
        if not (16 <= r < 32 and 32 <= c < 64)
    )
    assert len(got) == 32 * 32
    assert abs(sum(r["value"] for r in got) - exp) < 1e-9
    # missing chunk cells (fill_value) are present as zeros
    assert any(r["value"] == 0.0 for r in got)
