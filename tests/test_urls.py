"""URL canonicalization (functions/urls.py): RFC 3986 syntax-based
normalization — case, default ports, percent-escapes, dot-segments,
fragments — and loud refusal of unkeyable input."""

import pytest

from shared_etl_pipelines_spark.functions.urls import canonicalize_url


def test_normalizations():
    cases = [
        # case + default port + unreserved escape + escape casing
        ("HTTP://Example.COM:80/a/./b/../c%41?x=%3a",
         "http://example.com/a/cA?x=%3A"),
        ("https://h:443/", "https://h/"),
        ("https://h:8443/p", "https://h:8443/p"),  # non-default kept
        ("http://h", "http://h/"),                 # empty path -> /
        ("http://h/a/b/../../../c", "http://h/c"),  # over-popping ..
        ("http://h/%7Euser/%2Fx", "http://h/~user/%2Fx"),
        ("http://h/p#frag", "http://h/p"),          # fragment dropped
        ("http://h/p?", "http://h/p?"),             # empty query kept
        ("http://h/p?b=2&a=1", "http://h/p?b=2&a=1"),  # order KEPT
    ]
    for url, want in cases:
        assert canonicalize_url(url) == want, url


def test_idempotent():
    urls = ["HTTP://A.B:80/x/../y/%41%2f?q=%3a#f", "https://h:8443/p?x"]
    for u in urls:
        c = canonicalize_url(u)
        assert canonicalize_url(c) == c


def test_refusals():
    for bad in ("not-a-url", "http:///nohost", "http://h/%zz",
                "http://h/%4", "//protocol-relative/x"):
        with pytest.raises(ValueError):
            canonicalize_url(bad)


def test_spark_variants_collapse_to_one_key(spark):
    from shared_etl_pipelines_spark.queries_llm import q_url_canonical_dedup

    # doc ids that share (g, pa, pb) across all five variants:
    # d and d+270 share d%15, d%6, d%9 (lcm=90) but differ in d%5
    out = q_url_canonical_dedup(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    ok = [r for r in rows if r["is_valid"]]
    bad = [r for r in rows if not r["is_valid"]]
    assert all(r["reason"] == "malformed_escape" for r in bad)
    assert all(r["doc_id"] % 23 == 0 for r in bad)
    # canonical keys carry no uppercase, no default port, no fragment
    for r in ok:
        c = r["canonical"]
        assert c == c.lower() and ":80" not in c and "#" not in c
        assert c.startswith("http://site") and "/dir" in c


# ---------------------------------------------------------------------------
# JSON-LD extraction (sources/structured_data.py, r9-continued)
# ---------------------------------------------------------------------------
def test_jsonld_block_forms_and_flattening():
    from shared_etl_pipelines_spark.sources.structured_data import (
        extract_json_ld,
    )

    html = (
        '<script type="application/ld+json">{"@type":"Article",'
        '"headline":"H"}</script>'
        "<SCRIPT async type='application/ld+json'>[{\"@type\":\"Person\","
        "\"name\":\"P\"},{\"@type\":\"Organization\",\"name\":\"O\"}]"
        "</SCRIPT >"
        '<script type="application/ld+json">{"@graph":[{"@type":'
        '"WebSite","name":"W"}]}</script>'
        '<script type="text/javascript">var notLd = 1;</script>'
    )
    ents, errs = extract_json_ld(html)
    assert errs == []
    assert [(si, ei, e["@type"]) for si, ei, e in ents] == [
        (0, 0, "Article"), (1, 0, "Person"), (1, 1, "Organization"),
        (2, 0, "WebSite"),
    ]


def test_jsonld_per_block_quarantine():
    from shared_etl_pipelines_spark.sources.structured_data import (
        extract_json_ld,
    )

    html = (
        '<script type="application/ld+json">{"broken": </script>'
        '<script type="application/ld+json">"just a string"</script>'
        '<script type="application/ld+json">[{"@type":"A"}, 42]</script>'
        '<script type="application/ld+json">{"@graph": "not-a-list"}'
        "</script>"
        '<script type="application/ld+json">{"@type":"Ok"}</script>'
    )
    ents, errs = extract_json_ld(html)
    assert errs == [
        (0, "bad-json"), (1, "non-object"), (2, "non-object"),
        (3, "bad-graph"),
    ]
    assert len(ents) == 1 and ents[0][2]["@type"] == "Ok"
