"""robots.txt semantics (sources/robots.py): RFC 9309 group selection,
longest-match precedence, wildcards, allow-wins ties, liberal parsing."""

from shared_etl_pipelines_spark.sources.robots import (
    parse_robots,
    robots_allowed,
)

ROBOTS = """
# comment line
User-agent: *
Disallow: /

User-agent: sparkbot
User-agent: otherbot
Disallow: /private
Allow: /private/ok$
Disallow: /p*/q10$
Crawl-delay: 5
Sitemap: https://x.test/s.xml
"""


def test_group_selection_exact_token_beats_star():
    g = parse_robots(ROBOTS)
    # sparkbot gets its own group, NOT the disallow-everything default
    assert robots_allowed(g, "sparkbot", "/anything") == (True, "")
    assert robots_allowed(g, "SPARKBOT", "/private/x")[0] is False
    # multiple User-agent lines share the group
    assert robots_allowed(g, "otherbot", "/private/x")[0] is False
    # unknown agents fall back to '*'
    assert robots_allowed(g, "strangerbot", "/anything") == (False, "/")


def test_longest_match_and_dollar_anchor():
    g = parse_robots(ROBOTS)
    # Allow /private/ok$ (11 octets) beats Disallow /private (8)
    assert robots_allowed(g, "sparkbot", "/private/ok") == (
        True, "/private/ok$",
    )
    # ...but only with the exact end anchor
    assert robots_allowed(g, "sparkbot", "/private/okay")[0] is False
    # wildcard pattern: /p*/q10$ matches any /pX.../q10
    assert robots_allowed(g, "sparkbot", "/pages/q10") == (False, "/p*/q10$")
    assert robots_allowed(g, "sparkbot", "/pages/q10x")[0] is True


def test_equal_length_tie_resolves_to_allow():
    g = parse_robots(
        "User-agent: sparkbot\nDisallow: /a*c\nAllow: /ab*\n"
    )
    # both patterns are 4 octets and both match /abc -> allow wins
    assert robots_allowed(g, "sparkbot", "/abc") == (True, "/ab*")


def test_liberal_parsing_and_edge_cases():
    # rules before any User-agent line are ignored; empty Disallow
    # matches nothing; junk lines skipped; absent robots allows all
    g = parse_robots("Disallow: /x\nUser-agent: a\nDisallow:\njunk here\n")
    assert robots_allowed(g, "a", "/x") == (True, "")
    assert robots_allowed([], "a", "/x") == (True, "")
    # a Sitemap line between agent lines splits groups per the
    # User-agent-run rule
    g2 = parse_robots(
        "User-agent: a\nSitemap: s\nUser-agent: b\nDisallow: /\n"
    )
    assert robots_allowed(g2, "a", "/q")[0] is True
    assert robots_allowed(g2, "b", "/q")[0] is False
