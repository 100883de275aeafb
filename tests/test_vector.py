"""Shapefile (.shp/.dbf) reader/writer (sources/vector.py) and its
integration with the geo operators — the TIGER boundary ingestion
contract (county_path=.shp, GEOID/NAME/STUSPS attrs)."""

import struct

import pytest

from shared_etl_pipelines_spark.operators.geo import Polygon
from shared_etl_pipelines_spark.sources.vector import (
    read_dbf,
    read_shapefile,
    read_shp_rings,
    write_shapefile,
)

SQUARE = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]
TRIANGLE = [[10.0, 10.0], [14.0, 10.0], [12.0, 13.0]]


def _tiger_fixture(tmp_path, name="counties"):
    base = str(tmp_path / name)
    polys = [
        Polygon("26001", SQUARE, {"GEOID": "26001", "NAME": "Alcona", "STUSPS": "MI",
                                  "ALAND": 1500}),
        Polygon("26003", TRIANGLE, {"GEOID": "26003", "NAME": "Alger", "STUSPS": "MI",
                                    "ALAND": 2300}),
    ]
    write_shapefile(
        base,
        polys,
        fields=[("GEOID", "C", 5, 0), ("NAME", "C", 16, 0), ("STUSPS", "C", 2, 0),
                ("ALAND", "N", 10, 0)],
    )
    return base


def test_roundtrip_geometry_and_attrs(tmp_path):
    base = _tiger_fixture(tmp_path)
    polys = read_shapefile(base + ".shp", id_field="GEOID")
    assert [p.zone_id for p in polys] == ["26001", "26003"]
    # writer enforces CW outer winding; containment is winding-agnostic,
    # so compare as vertex SETS on the ring cycle
    assert sorted(map(tuple, polys[0].ring)) == sorted(map(tuple, SQUARE))
    assert polys[0].attrs["NAME"] == "Alcona"
    assert polys[0].attrs["ALAND"] == 1500  # N field with 0 decimals -> int
    assert polys[1].attrs["STUSPS"] == "MI"


def test_dbf_field_types(tmp_path):
    base = str(tmp_path / "t")
    write_shapefile(
        base,
        [Polygon("a", SQUARE, {"NAME": "x", "POP": 12, "AREA": 1.5})],
        fields=[("NAME", "C", 8, 0), ("POP", "N", 6, 0), ("AREA", "N", 8, 2)],
    )
    rows = read_dbf(open(base + ".dbf", "rb").read())
    assert rows == [{"NAME": "x", "POP": 12, "AREA": 1.5}]


def test_reader_rejects_non_shapefile():
    with pytest.raises(ValueError, match="file code"):
        read_shp_rings(b"\x00" * 100)


def test_multipart_record_yields_one_polygon_per_outer_ring(tmp_path):
    # hand-build a 2-part record: two CW outer squares
    def cw(ring):
        return ring[::-1]

    r1 = cw(SQUARE) + [cw(SQUARE)[0]]
    r2 = cw([[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 12.0]])
    r2 = r2 + [r2[0]]
    pts = r1 + r2
    content = struct.pack("<i", 5) + struct.pack("<4d", 0, 0, 12, 12)
    content += struct.pack("<ii", 2, len(pts))
    content += struct.pack("<ii", 0, len(r1))
    for x, y in pts:
        content += struct.pack("<2d", x, y)
    shp = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    shp += struct.pack(">i", (100 + 8 + len(content)) // 2)
    shp += struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    shp += struct.pack(">ii", 1, len(content) // 2) + content
    recs = read_shp_rings(shp)
    assert len(recs) == 1
    rings = recs[0]
    assert len(rings) == 2
    assert all(is_outer for _, is_outer in rings)
    # closing vertex dropped
    assert len(rings[0][0]) == 4 and len(rings[1][0]) == 4


def test_holes_are_skipped_by_default(tmp_path):
    # outer CW square + inner CCW square (a hole)
    outer = SQUARE[::-1]
    hole = [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]]  # CCW
    pts = outer + [outer[0]] + hole + [hole[0]]
    content = struct.pack("<i", 5) + struct.pack("<4d", 0, 0, 4, 4)
    content += struct.pack("<ii", 2, len(pts))
    content += struct.pack("<ii", 0, len(outer) + 1)
    for x, y in pts:
        content += struct.pack("<2d", x, y)
    shp = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    shp += struct.pack(">i", (100 + 8 + len(content)) // 2)
    shp += struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    shp += struct.pack(">ii", 1, len(content) // 2) + content
    base = tmp_path / "h.shp"
    base.write_bytes(shp)
    polys = read_shapefile(str(base))
    assert len(polys) == 1  # hole dropped
    assert read_shapefile(str(base), keep_holes=True) and len(
        read_shapefile(str(base), keep_holes=True)
    ) == 2


def test_clip_and_zonal_from_shapefile(spark, tmp_path):
    """The reference dataflow: boundaries from .shp, cells clipped and
    aggregated per zone (county_daily_aggregate.yml contract)."""
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.operators.geo import (
        clip_by_polygon,
        zonal_stats_polygons,
    )

    base = _tiger_fixture(tmp_path)
    polys = read_shapefile(base + ".shp", id_field="GEOID")
    cells = spark.range(100).select(
        (F.col("id") % 10 + 0.5).alias("cx"),
        (F.floor(F.col("id") / 10) + 0.5).alias("cy"),
        (F.col("id") * 1.0).alias("value"),
    )
    clipped = clip_by_polygon(cells, polys, key="STUSPS", value="MI")
    # square covers cx,cy in (0,4): 4x4 cell centers
    assert clipped.count() == 16
    z = zonal_stats_polygons(cells, polys, "value", aggregations="min,max",
                             value_prefix="v")
    got = {r["zone_id"]: (r["v_min"], r["v_max"]) for r in z.collect()}
    assert got["26001"] == (0.0, 33.0)  # cells (0..3, 0..3): max id = 3*10+3


def test_vector_facts_profiles_shapefile_attrs(spark, tmp_path):
    """O2 vector_facts over the attribute table of an ingested shapefile."""
    from shared_etl_pipelines_spark.sources.catalog import vector_facts

    base = _tiger_fixture(tmp_path)
    polys = read_shapefile(base + ".shp", id_field="GEOID")
    rows = [
        {"GEOID": p.attrs["GEOID"], "NAME": p.attrs["NAME"],
         "STUSPS": p.attrs["STUSPS"], "ALAND": p.attrs["ALAND"]}
        for p in polys
    ]
    df = spark.createDataFrame(rows)
    out = vector_facts(df, str(tmp_path / "facts"), name="tl_fixture_county")
    facts = out["facts"]
    assert facts["row_count"] == 2
    cols = {c["name"]: c for c in facts["columns"]}
    assert cols["STUSPS"]["null_count"] == 0


def test_dbf_deleted_record_keeps_alignment(tmp_path):
    """A deleted .dbf record must not shift later polygons' attributes
    (ADVICE r2): geometry record i always pairs with attribute row i."""
    import struct

    base = str(tmp_path / "del")
    write_shapefile(
        base,
        [
            Polygon("a", SQUARE, {"NAME": "first"}),
            Polygon("b", SQUARE, {"NAME": "second"}),
            Polygon("c", SQUARE, {"NAME": "third"}),
        ],
        fields=[("NAME", "C", 8, 0)],
    )
    raw = bytearray(open(base + ".dbf", "rb").read())
    header_size = struct.unpack_from("<H", raw, 8)[0]
    record_size = struct.unpack_from("<H", raw, 10)[0]
    raw[header_size + 0 * record_size] = ord("*")  # delete record 0
    open(base + ".dbf", "wb").write(bytes(raw))

    rows = read_dbf(bytes(raw))
    assert rows[0] is None and rows[1]["NAME"] == "second"

    polys = read_shapefile(base + ".shp", id_field="NAME")
    # record 0's attrs are gone (placeholder), records 1/2 keep their own
    assert [p.zone_id for p in polys] == ["0", "second", "third"]


# ---------------------------------------------------------------------------
# GeoJSON (sources/geojson.py, r9-continued) — web sibling of shapefiles
# ---------------------------------------------------------------------------
def test_geojson_winding_rings_and_bbox():
    import json

    from shared_etl_pipelines_spark.sources.geojson import parse_geojson

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"a": 1},
             "geometry": {"type": "Polygon", "coordinates":
                [[[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]],
                 [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon", "coordinates":
                [[[0, 0], [0, 3], [4, 3], [4, 0], [0, 0]]]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [7, -2]}},
            {"type": "Feature", "properties": {}, "geometry": None},
        ],
    }
    out = parse_geojson(json.dumps(fc))
    assert out[0]["n_rings"] == 2 and out[0]["winding_ok"]
    assert out[0]["area2"] == 24.0 and out[0]["bbox"] == (0, 0, 4, 3)
    assert not out[1]["winding_ok"] and out[1]["area2"] == -24.0
    assert out[2]["bbox"] == (7, -2, 7, -2)
    assert out[3]["geom_type"] == "null"


def test_geojson_refusals():
    import pytest

    from shared_etl_pipelines_spark.sources.geojson import parse_geojson

    bads = [
        '{"type":"Polygon","coordinates":[[[0,0],[1,0],[0,0]]]}',  # <4
        '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[2,2]]]}',
        '{"type":"Blob"}',
        "not json",
        "[1,2]",
        '{"type":"Point"}',  # no coordinates
        '{"type":"FeatureCollection","features":[{"type":"Blob"}]}',
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            parse_geojson(bad)
