"""GeoTIFF codec + long-table ingestion (sources/raster.py).

Round-trips cover every supported layout x codec x dtype combination;
decoder-only paths (predictor 2, PackBits, big-endian) are exercised via
hand-assembled minimal TIFFs.
"""

import struct

import numpy as np
import pytest

from shared_etl_pipelines_spark.sources.raster import (
    DEMO_DAYS,
    DEMO_SIZE,
    date_from_path,
    decode_geotiff,
    demo_raster_values,
    ensure_demo_rasters,
    read_geotiff_long,
    write_geotiff,
)


@pytest.mark.parametrize("dtype", ["u1", "u2", "u4", "i1", "i2", "i4", "f4", "f8"])
@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tile", [None, 8])
def test_roundtrip_all_layouts(tmp_path, dtype, compress, tile):
    rng = np.random.default_rng(42)
    if dtype.startswith("f"):
        arr = rng.random((13, 17)).astype(dtype)  # non-multiple of tile size
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=(13, 17)).astype(dtype)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, arr, compress=compress, tile=tile)
    got, meta = decode_geotiff(open(p, "rb").read())
    assert got.dtype.kind == arr.dtype.kind and got.dtype.itemsize == arr.dtype.itemsize
    np.testing.assert_array_equal(got, arr)
    assert meta["nodata"] is None


def test_geo_tags_roundtrip(tmp_path):
    arr = np.arange(12, dtype="i4").reshape(3, 4)
    p = str(tmp_path / "g.tif")
    write_geotiff(
        p, arr, nodata=7.0, pixel_scale=(0.25, 0.25), origin=(-120.0, 45.0)
    )
    got, meta = decode_geotiff(open(p, "rb").read())
    np.testing.assert_array_equal(got, arr)
    assert meta["nodata"] == 7.0
    assert meta["pixel_scale"][:2] == (0.25, 0.25)
    assert meta["tiepoint"][3:5] == (-120.0, 45.0)


def _minimal_tiff(arr_bytes, h, w, extra_entries, byteorder="<", bps=8, sfmt=1):
    """Hand-assemble a classic TIFF: header + IFD + one raw strip."""
    e = byteorder
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bps), (259, 3, 1, 1),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, len(arr_bytes)), (339, 3, 1, sfmt),
    ] + extra_entries
    entries.sort()
    data_off = 8 + 2 + len(entries) * 12 + 4
    entries = [(273, 4, 1, data_off)] + entries
    entries.sort()
    data_off = 8 + 2 + len(entries) * 12 + 4  # recompute with strip-offset entry
    entries = [(t, ty, c, data_off if t == 273 else v) for t, ty, c, v in entries]
    out = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        fmt = {3: "H", 4: "I"}[typ]
        enc = struct.pack(e + fmt, val).ljust(4, b"\0")
        out += struct.pack(e + "HHI", tag, typ, cnt) + enc
    out += struct.pack(e + "I", 0)
    assert len(out) == data_off
    return out + arr_bytes


def test_decoder_predictor2_horizontal_differencing():
    arr = np.array([[10, 12, 15], [7, 7, 9]], dtype="u1")
    diffed = np.diff(arr, axis=1, prepend=arr[:, :1].astype("u1"))
    diffed[:, 0] = arr[:, 0]
    data = _minimal_tiff(diffed.tobytes(), 2, 3, [(317, 3, 1, 2)])
    got, _ = decode_geotiff(data)
    np.testing.assert_array_equal(got, arr)


def test_decoder_packbits():
    arr = np.array([[5, 5, 5, 5, 1, 2]], dtype="u1")
    # replicate run [-3]->4x5, then literal run [1]-> 1,2
    packed = bytes([253, 5, 1, 1, 2])
    e = "<"
    entries = [
        (256, 4, 1, 6), (257, 4, 1, 1), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 4, 1, 1),
        (279, 4, 1, len(packed)), (339, 3, 1, 1),
    ]
    data_off = 8 + 2 + (len(entries) + 1) * 12 + 4
    entries.append((273, 4, 1, data_off))
    entries.sort()
    out = struct.pack(e + "2sHI", b"II", 42, 8) + struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        fmt = {3: "H", 4: "I"}[typ]
        out += struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(e + fmt, val).ljust(4, b"\0")
    out += struct.pack(e + "I", 0) + packed
    got, _ = decode_geotiff(out)
    np.testing.assert_array_equal(got, arr)


def test_decoder_big_endian():
    arr = np.array([[258, 772]], dtype=">u2")
    e = ">"
    raw = arr.tobytes()
    entries = [
        (256, 4, 1, 2), (257, 4, 1, 1), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 4, 1, 1),
        (279, 4, 1, len(raw)), (339, 3, 1, 1),
    ]
    data_off = 8 + 2 + (len(entries) + 1) * 12 + 4
    entries.append((273, 4, 1, data_off))
    entries.sort()
    out = struct.pack(e + "2sHI", b"MM", 42, 8) + struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        fmt = {3: "H", 4: "I"}[typ]
        out += struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(e + fmt, val).ljust(4, b"\0")
    out += struct.pack(e + "I", 0) + raw
    got, _ = decode_geotiff(out)
    np.testing.assert_array_equal(got.astype("u2"), arr.astype("u2"))


def test_date_from_path_prism_convention():
    assert str(date_from_path("/x/prism_ppt_us_30s_20240301.tif")) == "2024-03-01"
    assert date_from_path("/x/no_date_here.tif") is None


def test_read_geotiff_long_decodes_corpus_in_parallel(spark, tmp_path):
    d = ensure_demo_rasters(str(tmp_path / "tifs"))
    df = read_geotiff_long(spark, d, drop_nodata=False)
    assert df.schema.simpleString() == (
        "struct<day:date,y:int,x:int,value:double>"
    )
    n = df.count()
    assert n == DEMO_DAYS * DEMO_SIZE * DEMO_SIZE
    # one decode task per file
    assert df.rdd.getNumPartitions() >= 2
    # spot-check values against the formula for a strip day and a tile day
    import pandas as pd

    got = df.filter("day = DATE '2024-03-01'").toPandas()  # d=0: tiled
    expect = demo_raster_values(0)
    pivot = got.pivot(index="y", columns="x", values="value").to_numpy()
    np.testing.assert_array_equal(pivot, expect)
    got1 = df.filter("day = DATE '2024-03-02'").toPandas()  # d=1: deflate strips
    pivot1 = got1.pivot(index="y", columns="x", values="value").to_numpy()
    np.testing.assert_array_equal(pivot1, demo_raster_values(1))


def test_read_geotiff_long_drops_nodata(spark, tmp_path):
    p = tmp_path / "tifs2"
    p.mkdir()
    arr = np.array([[1, 999], [999, 4]], dtype="i4")
    write_geotiff(str(p / "prism_ppt_us_30s_20240101.tif"), arr, nodata=999.0)
    rows = read_geotiff_long(spark, str(p)).orderBy("y", "x").collect()
    assert [(r["y"], r["x"], r["value"]) for r in rows] == [(0, 0, 1.0), (1, 1, 4.0)]


def test_geotiff_stream_incremental_daily_arrival(spark, tmp_path):
    """The reference's daily drop cadence as a real streaming source:
    first run drains the backlog into a durable sink; files dropped later
    are emitted by the NEXT run from the same checkpoint exactly once
    (the memory sink can't recover a checkpoint — parquet sink here)."""
    from datetime import date, timedelta

    import numpy as np

    from shared_etl_pipelines_spark.sources.raster import write_geotiff
    from shared_etl_pipelines_spark.sources.raster_stream import (
        GeoTiffStreamDataSource,
    )

    spark.dataSource.register(GeoTiffStreamDataSource)
    drop = tmp_path / "drop"
    drop.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_day(d):
        day = date(2024, 3, 1) + timedelta(days=d)
        arr = np.full((4, 4), d, dtype="i4")
        write_geotiff(
            str(drop / f"prism_ppt_us_30s_{day.strftime('%Y%m%d')}.tif"), arr
        )

    for d in range(3):
        write_day(d)

    def run_once():
        q = (
            spark.readStream.format("geotiff_stream")
            .option("path", str(drop))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 3 * 16
    days = {r["day"] for r in got.select("day").distinct().collect()}
    assert days == {"2024-03-01", "2024-03-02", "2024-03-03"}

    # two more days arrive; restart from the same checkpoint
    write_day(3)
    write_day(4)
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 5 * 16  # exactly once: no re-emitted backlog
    vals = {
        r["day"]: r["v"]
        for r in got.groupby("day").agg({"value": "max"})
        .withColumnRenamed("max(value)", "v").collect()
    }
    assert vals["2024-03-05"] == 4.0 and vals["2024-03-01"] == 0.0


def test_read_geotiff_long_corrupt_file_handling(spark, tmp_path):
    """on_error='skip' drops undecodable files; default mode names the
    bad path in the failure."""
    import pytest as _pytest

    p = tmp_path / "tifs3"
    p.mkdir()
    write_geotiff(str(p / "prism_20240101.tif"), np.ones((2, 2), dtype="i4"))
    (p / "prism_20240102.tif").write_bytes(b"not a tiff at all")

    ok = read_geotiff_long(spark, str(p), on_error="skip")
    assert ok.count() == 4  # only the good file's pixels

    strict = read_geotiff_long(spark, str(p))
    with _pytest.raises(Exception, match="prism_20240102"):
        strict.count()


def test_lzw_roundtrip_strip_and_tiled(tmp_path):
    """LZW-compressed GeoTIFFs (the wild-GeoTIFF default codec) decode
    bit-exactly, strip and tiled layouts, float32 and uint8."""
    import numpy as np

    from shared_etl_pipelines_spark.sources.raster import (
        decode_geotiff,
        write_geotiff,
    )

    rng = np.random.default_rng(11)
    f32 = rng.normal(size=(37, 53)).astype(np.float32)
    u8 = rng.integers(0, 7, size=(64, 48)).astype(np.uint8)  # repetitive -> LZW-friendly
    for name, arr, tile in (
        ("strip_f32", f32, None),
        ("tiled_f32", f32, 16),
        ("strip_u8", u8, None),
        ("tiled_u8", u8, 32),
    ):
        p = str(tmp_path / f"{name}.tif")
        write_geotiff(p, arr, compress="lzw", tile=tile, nodata=-1.0)
        got, meta = decode_geotiff(open(p, "rb").read())
        assert got.dtype == arr.dtype
        assert np.array_equal(got, arr), name
        assert meta["nodata"] == -1.0


def test_lzw_decoder_handles_kwkwk_and_width_growth():
    """The code==table-size (KwKwK) case and every width bump 9->12 are
    exercised by a low-entropy megabyte; decode must invert encode."""
    import numpy as np

    from shared_etl_pipelines_spark.sources.raster import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(5)
    data = rng.integers(0, 3, size=1_000_000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data)) == data


def test_bigtiff_roundtrip_all_layouts(tmp_path):
    """BigTIFF container (magic 43, u64 offsets, LONG8 offset tags)
    round-trips bit-exactly across codecs and strip/tile layouts, and
    geo tags survive."""
    import numpy as np

    from shared_etl_pipelines_spark.sources.raster import (
        decode_geotiff,
        write_geotiff,
    )

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 1000, size=(37, 53)).astype("i4")
    for compress in (False, True, "lzw"):
        for tile in (None, 16):
            p = str(tmp_path / f"bt_{compress}_{tile}.tif")
            write_geotiff(
                p, arr, compress=compress, tile=tile, nodata=-9.0,
                bigtiff=True, pixel_scale=(0.5, 0.5), origin=(-100.0, 40.0),
            )
            data = open(p, "rb").read()
            assert data[2:4] == b"\x2b\x00"  # magic 43
            got, meta = decode_geotiff(data)
            assert np.array_equal(got, arr), (compress, tile)
            assert meta["nodata"] == -9.0
            assert meta["pixel_scale"][:2] == (0.5, 0.5)


def test_cog_overview_chain_selection(tmp_path):
    """overviews=k writes k chained reduced-resolution IFDs; decode
    selects by level, each level is the 2x block average of the one
    above (odd edges clamped), and a missing level raises."""
    import numpy as np
    import pytest

    from shared_etl_pipelines_spark.sources.raster import (
        decode_geotiff,
        downsample2x,
        list_overviews,
        write_geotiff,
    )

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 1000, size=(37, 53)).astype("i4")
    for big in (False, True):
        p = str(tmp_path / f"cog_{big}.tif")
        write_geotiff(p, arr, tile=16, compress="lzw", overviews=2, bigtiff=big)
        data = open(p, "rb").read()
        assert list_overviews(data) == [(53, 37), (27, 19), (14, 10)]
        full, meta = decode_geotiff(data)
        assert meta["n_ifds"] == 3 and np.array_equal(full, arr)
        o1, _ = decode_geotiff(data, overview=1)
        assert np.array_equal(o1, downsample2x(arr))
        o2, _ = decode_geotiff(data, overview=2)
        assert np.array_equal(o2, downsample2x(downsample2x(arr)))
        with pytest.raises(ValueError, match="overview level 3"):
            decode_geotiff(data, overview=3)


def test_read_geotiff_long_overview_level(spark, tmp_path):
    """read_geotiff_long(overview=1) emits the reduced grid only —
    the 4^-k cheap-scan path — with values matching downsample2x."""
    import numpy as np

    from shared_etl_pipelines_spark.sources.raster import (
        downsample2x,
        read_geotiff_long,
        write_geotiff,
    )

    arr = (np.arange(256, dtype="i4") % 97).reshape(16, 16)
    write_geotiff(
        str(tmp_path / "prism_ppt_us_30s_20240301.tif"), arr,
        overviews=1, bigtiff=True,
    )
    rows = read_geotiff_long(
        spark, str(tmp_path), drop_nodata=False, overview=1
    ).collect()
    want = downsample2x(arr)
    assert len(rows) == 64
    got = {(r["y"], r["x"]): r["value"] for r in rows}
    assert all(got[(y, x)] == float(want[y, x]) for y in range(8) for x in range(8))
