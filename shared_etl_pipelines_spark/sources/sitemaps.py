"""Sitemap protocol parsing + validation (sitemaps.org, public spec).

The discovery-side complement of ``sources/robots.py`` (RFC 9309): a
crawl corpus audit re-verifies not only that fetches were ALLOWED but
that URL discovery matched the site's declared sitemap inventory —
coverage gaps and zombie URLs both surface as sitemap/corpus diffs.

Implements the protocol's two document kinds and its validation rules:

- ``<urlset>``: ``<url>`` entries with required ``<loc>`` and optional
  ``<lastmod>`` (W3C datetime), ``<changefreq>`` (closed enum),
  ``<priority>`` (0.0–1.0, default 0.5);
- ``<sitemapindex>``: ``<sitemap>`` child references with ``<loc>`` +
  optional ``<lastmod>``;
- limits: max 50,000 entries per file (the spec's hard cap) — more is
  a structural refusal, not a truncation;
- XML entity escaping: ``<loc>`` values arrive entity-escaped
  (``&amp;`` etc.); parsing restores the raw URL;
- liberal namespace handling: tags match on local name, because real
  sitemaps ship with and without the protocol namespace.

Structural problems (unparseable XML, unknown root, over-cap) raise
``ValueError`` → the Spark wrapper quarantines the whole blob, loudly.
Per-ENTRY problems (missing loc, out-of-range priority, unknown
changefreq) are NOT structural: the spec says consumers may ignore
them, but a curation audit must SEE them, so each entry carries
``(is_valid, reason)`` instead of being dropped.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

MAX_ENTRIES = 50_000
CHANGEFREQS = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
)

__all__ = ["parse_sitemap", "validate_entry", "MAX_ENTRIES", "CHANGEFREQS"]


def _local(tag: str) -> str:
    return tag.rpartition("}")[2]


def parse_sitemap(text: str) -> dict:
    """Parse one sitemap document.

    Returns ``{"kind": "urlset"|"sitemapindex", "entries": [entry]}``
    with ``entry = {"loc": str|None, "lastmod": str|None, "changefreq":
    str|None, "priority": str|None}`` (raw field strings; validation is
    a separate, visible step). Raises ``ValueError`` on malformed XML,
    an unknown root element, or more than ``MAX_ENTRIES`` entries.
    """
    if "<!DOCTYPE" in text or "<!ENTITY" in text:
        # crawl input is untrusted: DTD entity expansion is the
        # billion-laughs surface — refuse, never expand
        raise ValueError("sitemap: DTD/entities not allowed — quarantine")
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise ValueError(f"sitemap: malformed XML — quarantine ({e})") from e
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"sitemap: unknown root <{kind}> — quarantine")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue  # liberal: foreign elements are skipped per spec
        entry = {"loc": None, "lastmod": None, "changefreq": None,
                 "priority": None}
        for f in el:
            name = _local(f.tag)
            if name in entry:
                entry[name] = (f.text or "").strip()
        entries.append(entry)
        if len(entries) > MAX_ENTRIES:
            raise ValueError(
                f"sitemap: more than {MAX_ENTRIES} entries — quarantine"
            )
    return {"kind": kind, "entries": entries}


def validate_entry(entry: dict, kind: str = "urlset") -> tuple[bool, str]:
    """Protocol validation for one parsed entry — checked in a fixed,
    documented precedence so audits are deterministic: missing loc,
    then oversize loc (2,048-octet cap), then priority range/format,
    then the changefreq enum. Index entries only carry loc/lastmod."""
    loc = entry.get("loc")
    if not loc:
        return False, "missing-loc"
    if len(loc.encode("utf-8")) > 2048:
        return False, "loc-too-long"
    if kind == "urlset":
        pr = entry.get("priority")
        if pr is not None:
            try:
                v = float(pr)
            except ValueError:
                return False, "bad-priority"
            if not (0.0 <= v <= 1.0):
                return False, "bad-priority"
        cf = entry.get("changefreq")
        if cf is not None and cf not in CHANGEFREQS:
            return False, "bad-changefreq"
    return True, "ok"
