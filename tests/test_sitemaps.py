"""Sitemap protocol parsing + validation (sources/sitemaps.py)."""
import pytest

from shared_etl_pipelines_spark.sources.sitemaps import (
    CHANGEFREQS,
    MAX_ENTRIES,
    parse_sitemap,
    validate_entry,
)

_NS = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_urlset_roundtrip_with_and_without_namespace():
    for ns in ("", _NS):
        xml = (
            f"<urlset{ns}>"
            "<url><loc>https://a.test/p?x=1&amp;y=2</loc>"
            "<lastmod>2026-01-15</lastmod>"
            "<changefreq>daily</changefreq>"
            "<priority>0.7</priority></url>"
            "<url><loc>https://a.test/q</loc></url>"
            "</urlset>"
        )
        out = parse_sitemap(xml)
        assert out["kind"] == "urlset"
        e0, e1 = out["entries"]
        assert e0["loc"] == "https://a.test/p?x=1&y=2"  # entity-unescaped
        assert e0["lastmod"] == "2026-01-15"
        assert e0["changefreq"] == "daily"
        assert e0["priority"] == "0.7"
        assert e1 == {"loc": "https://a.test/q", "lastmod": None,
                      "changefreq": None, "priority": None}
        assert validate_entry(e0) == (True, "ok")
        assert validate_entry(e1) == (True, "ok")


def test_sitemapindex():
    xml = (
        f"<sitemapindex{_NS}><sitemap><loc>https://a.test/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap></sitemapindex>"
    )
    out = parse_sitemap(xml)
    assert out["kind"] == "sitemapindex"
    assert out["entries"][0]["loc"] == "https://a.test/s1.xml"
    assert validate_entry(out["entries"][0], "sitemapindex") == (True, "ok")


def test_validation_precedence_and_reasons():
    assert validate_entry({"loc": None}) == (False, "missing-loc")
    assert validate_entry({"loc": ""}) == (False, "missing-loc")
    long = {"loc": "https://a.test/" + "x" * 2048}
    assert validate_entry(long) == (False, "loc-too-long")
    bad_pr = {"loc": "https://a.test/", "priority": "1.5"}
    assert validate_entry(bad_pr) == (False, "bad-priority")
    assert validate_entry({"loc": "https://a.test/", "priority": "abc"}) == (
        False, "bad-priority",
    )
    bad_cf = {"loc": "https://a.test/", "changefreq": "sometimes"}
    assert validate_entry(bad_cf) == (False, "bad-changefreq")
    # priority outranks changefreq when both are bad
    both = {"loc": "https://a.test/", "priority": "-1", "changefreq": "zz"}
    assert validate_entry(both) == (False, "bad-priority")
    # index entries skip urlset-only checks
    assert validate_entry(bad_pr, "sitemapindex") == (True, "ok")
    for cf in CHANGEFREQS:
        assert validate_entry({"loc": "https://a.test/", "changefreq": cf}) \
            == (True, "ok")


def test_structural_refusals():
    with pytest.raises(ValueError):
        parse_sitemap("<urlset><url></urlset")  # malformed
    with pytest.raises(ValueError):
        parse_sitemap("<rss><channel/></rss>")  # unknown root
    many = "<urlset>" + "<url><loc>u</loc></url>" * (MAX_ENTRIES + 1) \
        + "</urlset>"
    with pytest.raises(ValueError):
        parse_sitemap(many)


def test_foreign_elements_skipped():
    xml = (
        "<urlset><x:extension xmlns:x=\"urn:x\"/>"
        "<url><loc>https://a.test/</loc>"
        "<mobile>yes</mobile></url></urlset>"
    )
    out = parse_sitemap(xml)
    assert len(out["entries"]) == 1
    assert out["entries"][0]["loc"] == "https://a.test/"


# ---------------------------------------------------------------------------
# RSS/Atom feeds (sources/feeds.py, r9-continued) — discovery suite
# ---------------------------------------------------------------------------
def test_rss_and_atom_parse():
    from shared_etl_pipelines_spark.sources.feeds import (
        parse_feed,
        validate_entry,
    )

    rss = (
        '<rss version="2.0"><channel><title>T</title>'
        "<item><title>a</title><link>https://x/1</link>"
        "<guid>g1</guid><pubDate>d1</pubDate>"
        "<description>body</description></item>"
        "<item><title>b</title><guid>g2</guid></item>"
        "</channel></rss>"
    )
    out = parse_feed(rss)
    assert out["kind"] == "rss" and out["title"] == "T"
    assert out["entries"][0]["link"] == "https://x/1"
    assert out["entries"][0]["has_content"]
    assert validate_entry(out["entries"][0]) == (True, "ok")
    assert validate_entry(out["entries"][1]) == (False, "missing-link")

    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>'
        "<entry><title>p</title>"
        '<link rel="self" href="https://x/feed"/>'
        '<link href="https://x/post"/>'
        "<id>i1</id><updated>u1</updated><content>c</content></entry>"
        "<entry><title>q</title><link href='https://x/q'/></entry>"
        "</feed>"
    )
    out = parse_feed(atom)
    assert out["kind"] == "atom"
    # rel="self" decoy skipped per RFC 4287 §4.2.7.2
    assert out["entries"][0]["link"] == "https://x/post"
    assert validate_entry(out["entries"][1]) == (False, "missing-id")


def test_feed_refusals():
    from shared_etl_pipelines_spark.sources.feeds import parse_feed

    with pytest.raises(ValueError):
        parse_feed("<rss><channel><item></rss")
    with pytest.raises(ValueError):
        parse_feed("<opml/>")
    with pytest.raises(ValueError):
        parse_feed("<rss version='2.0'><nochannel/></rss>")


def test_xml_parsers_refuse_dtd_entities():
    """Self-review (r9-continued): DTD entity expansion (billion
    laughs) refused across every ET-based parser for crawl input."""
    from shared_etl_pipelines_spark.sources.captions import parse_ttml
    from shared_etl_pipelines_spark.sources.feeds import parse_feed
    from shared_etl_pipelines_spark.sources.svg import parse_svg

    bomb = (
        '<!DOCTYPE b [<!ENTITY a "xx"><!ENTITY b "&a;&a;&a;&a;">]>'
        "<urlset><url><loc>&b;</loc></url></urlset>"
    )
    with pytest.raises(ValueError):
        parse_sitemap(bomb)
    with pytest.raises(ValueError):
        parse_feed(bomb.replace("urlset", "rss"))
    with pytest.raises(ValueError):
        parse_svg(bomb.replace("urlset", "svg"))
    with pytest.raises(ValueError):
        parse_ttml(bomb.replace("urlset", "tt"))
