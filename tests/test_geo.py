"""Geo operator unit tests: ray-cast semantics on hand-checkable shapes
(triangle, non-convex L, holes-by-parity), zone assignment tie-breaks,
and polygon zonal stats vs hand computation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.operators.geo import (
    Polygon,
    clip_by_polygon,
    ray_cast,
    tag_zones,
    zonal_stats_polygons,
)

TRI = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
L = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)


def test_ray_cast_triangle():
    px = np.array([1.0, 3.0, 1.0, 3.5, -1.0])
    py = np.array([1.0, 0.5, 2.5, 3.5, 1.0])
    assert ray_cast(px, py, TRI).tolist() == [True, True, True, False, False]


def test_ray_cast_nonconvex_L():
    px = np.array([1.0, 3.0, 3.0, 1.0])
    py = np.array([1.0, 1.0, 3.0, 3.0])
    # (3,3) sits in the notch of the L
    assert ray_cast(px, py, L).tolist() == [True, True, False, True]


def test_tag_zones_first_match_and_null(spark):
    cells = spark.createDataFrame(
        [(0.5, 0.5), (3.0, 3.0), (9.0, 9.0)], ["cx", "cy"]
    )
    polys = [
        Polygon("a", [[0, 0], [4, 0], [4, 4], [0, 4]]),
        Polygon("b", [[0, 0], [8, 0], [8, 8], [0, 8]]),  # overlaps a
    ]
    got = {(r["cx"], r["cy"]): r["zone_id"] for r in tag_zones(cells, polys).collect()}
    assert got[(0.5, 0.5)] == "a"  # first match wins inside overlap
    assert got[(3.0, 3.0)] == "a"
    assert got[(9.0, 9.0)] is None  # outside everything


def test_clip_by_polygon_attribute_selector(spark):
    cells = spark.createDataFrame(
        [(float(x) + 0.5, 0.5) for x in range(8)], ["cx", "cy"]
    )
    polys = [
        Polygon("mi", [[0, 0], [4, 0], [4, 1], [0, 1]], {"stusps": "MI"}),
        Polygon("oh", [[4, 0], [8, 0], [8, 1], [4, 1]], {"stusps": "OH"}),
    ]
    kept = clip_by_polygon(cells, polys, key="stusps", value="MI").collect()
    assert sorted(r["cx"] for r in kept) == [0.5, 1.5, 2.5, 3.5]


def test_zonal_stats_polygons_hand_check(spark):
    # zone q: values 1..4 -> med 2.5; zone r: single cell 10 -> all aggs 10
    rows = [(0.5, 0.5, 1.0), (1.5, 0.5, 2.0), (0.5, 1.5, 3.0), (1.5, 1.5, 4.0),
            (5.5, 0.5, 10.0)]
    cells = spark.createDataFrame(rows, ["cx", "cy", "v"])
    polys = [
        Polygon("q", [[0, 0], [2, 0], [2, 2], [0, 2]]),
        Polygon("r", [[5, 0], [6, 0], [6, 1], [5, 1]]),
    ]
    out = {
        r["zone_id"]: r
        for r in zonal_stats_polygons(cells, polys, "v", "min,med,avg,max").collect()
    }
    assert out["q"]["min"] == 1.0 and out["q"]["max"] == 4.0
    assert out["q"]["med"] == pytest.approx(2.5)
    assert out["q"]["avg"] == pytest.approx(2.5)
    assert all(out["r"][k] == 10.0 for k in ("min", "med", "avg", "max"))


def test_bucket_clip_matches_broadcast_clip(spark, sf_dir):
    """The bucketed scale path and the broadcast path are the same
    operator semantically — identical result sets."""
    from shared_etl_pipelines_spark.operators.geo import bucket_clip, clip_by_polygon
    from shared_etl_pipelines_spark.queries_geo import POLYGONS, _cells

    cells = _cells(spark, sf_dir)
    a = clip_by_polygon(cells, POLYGONS, key="stusps", value="MI")
    b = bucket_clip(cells, POLYGONS, cell_size=5.0, key="stusps", value="MI")
    from collections import Counter

    cols = ["l_orderkey", "l_linenumber", "cx", "cy", "value"]
    ca = Counter(tuple(r) for r in a.select(cols).collect())
    cb = Counter(tuple(r) for r in b.select(cols).collect())
    assert ca == cb and sum(ca.values()) > 0
