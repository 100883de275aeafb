"""Prometheus text exposition parsing (sources/promtext.py)."""
import pytest

from shared_etl_pipelines_spark.sources.promtext import parse_prom_text

SCRAPE = """
# HELP app_temp Current temperature.
# TYPE app_temp gauge
app_temp{host="a",dc="x\\"y"} 21.5
app_temp{host="b"} -3
# TYPE req_total counter
req_total 1027 1755302400000
# TYPE lat histogram
lat_bucket{le="0.5"} 3
lat_bucket{le="1"} 7
lat_bucket{le="+Inf"} 9
lat_count 9
lat_sum 4.5
untyped_thing 1
"""


def test_families_types_and_escapes():
    o = parse_prom_text(SCRAPE)
    assert o["n_samples"] == 9 and o["n_untyped_samples"] == 1
    m = o["metrics"]
    assert m["app_temp"]["type"] == "gauge"
    assert m["app_temp"]["n_samples"] == 2
    assert m["app_temp"]["help"] == "Current temperature."
    assert m["req_total"]["type"] == "counter"
    assert m["untyped_thing"]["type"] == "untyped"


def test_histogram_contract():
    assert parse_prom_text(SCRAPE)["metrics"]["lat"]["buckets_ok"]
    # missing +Inf bucket
    o = parse_prom_text(SCRAPE.replace('lat_bucket{le="+Inf"} 9\n', ""))
    assert not o["metrics"]["lat"]["buckets_ok"]
    # non-monotone cumulative counts
    o = parse_prom_text(SCRAPE.replace('lat_bucket{le="1"} 7',
                                       'lat_bucket{le="1"} 2'))
    assert not o["metrics"]["lat"]["buckets_ok"]
    # +Inf bucket disagrees with _count
    o = parse_prom_text(SCRAPE.replace("lat_count 9", "lat_count 11"))
    assert not o["metrics"]["lat"]["buckets_ok"]


def test_refusals():
    for bad in ("}{ 1", 'x{le="} 1', "# TYPE t wat", "name 1 2 3 4",
                "name nope"):
        with pytest.raises(ValueError):
            parse_prom_text(bad)
    with pytest.raises(ValueError):  # duplicate TYPE
        parse_prom_text("# TYPE a gauge\n# TYPE a counter\na 1")
