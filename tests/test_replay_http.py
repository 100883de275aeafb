"""Recorded-response replay for the live-ingestion HTTP branches
(VERDICT r9 stretch #8): the conditional-GET 304 handshake, redirect
following, and STAC rel=next pagination execute against canned wire
bytes through the production urllib machinery — no socket, no skip."""

import json

import pytest

from shared_etl_pipelines_spark.sources import ingest as I
from shared_etl_pipelines_spark.sources.replay import Recorded, ReplaySession

BASE = "http://replay.test"


def test_replay_refuses_unscripted_urls(tmp_path):
    with ReplaySession({}) as rs:
        with pytest.raises(AssertionError, match="unscripted"):
            I.web_download_list(
                urls=[f"{BASE}/nope.bin"], out=str(tmp_path)
            )
    assert rs.sent("GET", f"{BASE}/nope.bin")


def test_web_download_conditional_get_304_handshake(tmp_path):
    url = f"{BASE}/data/file1.bin"
    script = {
        ("GET", url): [
            Recorded(
                200, b"v1-bytes", {"ETag": '"v1"', "Content-Length": "8"}
            ),
            Recorded(304),
            Recorded(
                200, b"v2-bytes!", {"ETag": '"v2"', "Content-Length": "9"}
            ),
        ]
    }
    out = str(tmp_path / "out")
    with ReplaySession(script) as rs:
        r1 = I.web_download_list(
            urls=[url], out=out, conditional_get=True
        )
        assert len(r1["downloaded"]) == 1 and not r1["skipped"]
        assert open(r1["downloaded"][0], "rb").read() == b"v1-bytes"
        # first request carries no validators (nothing cached yet)
        assert "If-none-match" not in rs.requests[0].headers

        r2 = I.web_download_list(
            urls=[url], out=out, conditional_get=True
        )
        assert not r2["downloaded"] and len(r2["skipped"]) == 1
        # second request sent the stored ETag and honored the 304
        assert rs.requests[1].headers.get("If-none-match") == '"v1"'
        assert open(r1["downloaded"][0], "rb").read() == b"v1-bytes"

        r3 = I.web_download_list(
            urls=[url], out=out, conditional_get=True
        )
        assert len(r3["downloaded"]) == 1  # changed upstream: refetched
        assert open(r3["downloaded"][0], "rb").read() == b"v2-bytes!"
        assert rs.requests[2].headers.get("If-none-match") == '"v1"'
    # manifest now pins the new validators
    mf = I._load_manifest(out)
    assert mf[url]["etag"] == '"v2"'


def test_web_download_follows_redirects(tmp_path):
    url = f"{BASE}/moved.bin"
    final = f"{BASE}/real/here.bin"
    script = {
        ("GET", url): [Recorded(302, b"", {"Location": final})],
        ("GET", final): [Recorded(200, b"payload")],
    }
    with ReplaySession(script) as rs:
        r = I.web_download_list(urls=[url], out=str(tmp_path))
        assert len(r["downloaded"]) == 1
        assert open(r["downloaded"][0], "rb").read() == b"payload"
    # the stock HTTPRedirectHandler issued the second request
    assert rs.sent("GET", final)


def _item(i, coll="c1", dt="2024-06-01T00:00:00Z", cloud=5):
    return {
        "id": f"item-{i:03d}",
        "collection": coll,
        "bbox": [0, 0, 1, 1],
        "properties": {"datetime": dt, "eo:cloud_cover": cloud},
        "assets": {
            "data": {"href": f"{BASE}/assets/item-{i:03d}.tif"},
        },
    }


def test_stac_pagination_and_asset_download(tmp_path):
    search = f"{BASE}/stac/search"
    page2 = f"{BASE}/stac/search?page=2"
    page1_body = {
        "features": [_item(0), _item(1)],
        "links": [
            {
                "rel": "next",
                "href": page2,
                "method": "POST",
                "body": {"page": 2},
                "merge": True,
            }
        ],
    }
    page2_body = {"features": [_item(2), _item(3, cloud=80)], "links": []}
    script = {
        ("POST", search): [Recorded(200, json.dumps(page1_body).encode())],
        ("POST", page2): [Recorded(200, json.dumps(page2_body).encode())],
    }
    for i in range(4):
        script[("GET", f"{BASE}/assets/item-{i:03d}.tif")] = [
            Recorded(200, b"TIF" + bytes([i]))
        ]
    out = str(tmp_path / "stac")
    with ReplaySession(script) as rs:
        r = I.stac_asset_download(
            f"{BASE}/stac",
            collection="c1",
            out=out,
            query_json={"eo:cloud_cover": {"lt": 50}},
            page_size=2,
        )
    # both pages walked; the cloudy item filtered out AFTER pagination
    assert r["items"] == ["item-000", "item-001", "item-002"]
    assert len(r["downloaded"]) == 3
    # the next link's merge body rode on top of the original search body
    second = rs.sent("POST", page2)[0]
    body = json.loads(second.body)
    assert body["page"] == 2 and body["collections"] == ["c1"]
    assert body["limit"] == 2  # merged, not replaced


def test_stac_max_items_stops_pagination_early(tmp_path):
    search = f"{BASE}/stac/search"
    page2 = f"{BASE}/stac/search?page=2"
    page1 = {
        "features": [_item(0), _item(1)],
        "links": [{"rel": "next", "href": page2, "method": "POST",
                   "body": {"page": 2}, "merge": True}],
    }
    script = {
        ("POST", search): [Recorded(200, json.dumps(page1).encode())],
        ("GET", f"{BASE}/assets/item-000.tif"): [Recorded(200, b"T0")],
    }
    with ReplaySession(script) as rs:
        r = I.stac_asset_download(
            f"{BASE}/stac", collection="c1", out=str(tmp_path / "s"),
            max_items=1,
        )
    assert r["items"] == ["item-000"]
    assert not rs.sent("POST", page2)  # satisfied on page 1: no 2nd call
