"""RSS 2.0 / Atom feed parsing — the crawl-discovery format next to
sitemaps (sources/sitemaps.py) and robots (sources/robots.py).

Feeds are how a crawler finds NEW content between sitemap refreshes;
a corpus audit re-reads them to reconcile discovery against what was
fetched. Both formats are public specs (RSS 2.0, RFC 4287 Atom) and
both arrive malformed constantly, so the same contract as the sitemap
module applies: structural failures (broken XML, unknown root)
quarantine the whole blob loudly, while per-ENTRY defects (missing
link, missing id) stay visible as ``(is_valid, reason)`` rows instead
of silent drops.

Namespace handling is liberal (local-name matching) because real RSS
ships with and without namespaces; Atom ``<link>`` honors the
``rel="alternate"``-or-unset selection rule from RFC 4287 §4.2.7.2.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["parse_feed", "validate_entry"]


def _local(tag) -> str:
    return tag.rpartition("}")[2] if isinstance(tag, str) else ""


def _child_text(el, name: str) -> str | None:
    for c in el:
        if _local(c.tag) == name:
            return (c.text or "").strip()
    return None


def parse_feed(text: str) -> dict:
    """-> {kind: 'rss'|'atom', title, entries: [{title, link, entry_id,
    published, has_content}]}. Raises ValueError on malformed XML or an
    unknown root element."""
    if "<!DOCTYPE" in text or "<!ENTITY" in text:
        # untrusted crawl input: DTD entity expansion (billion laughs)
        # is refused, never expanded
        raise ValueError("feed: DTD/entities not allowed — quarantine")
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise ValueError(f"feed: malformed XML — quarantine ({e})") from e
    kind = _local(root.tag)
    entries = []
    if kind == "rss":
        channel = None
        for c in root:
            if _local(c.tag) == "channel":
                channel = c
        if channel is None:
            raise ValueError("feed: rss without channel — quarantine")
        title = _child_text(channel, "title") or ""
        for item in channel:
            if _local(item.tag) != "item":
                continue
            entries.append(
                {
                    "title": _child_text(item, "title") or "",
                    "link": _child_text(item, "link"),
                    "entry_id": _child_text(item, "guid"),
                    "published": _child_text(item, "pubDate") or "",
                    "has_content": _child_text(item, "description")
                    is not None,
                }
            )
    elif kind == "feed":
        kind = "atom"
        title = _child_text(root, "title") or ""
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            link = None
            for c in entry:
                if _local(c.tag) == "link":
                    rel = c.get("rel")
                    if rel in (None, "alternate"):
                        link = c.get("href")
                        break
            entries.append(
                {
                    "title": _child_text(entry, "title") or "",
                    "link": link,
                    "entry_id": _child_text(entry, "id"),
                    "published": _child_text(entry, "updated") or "",
                    "has_content": _child_text(entry, "content") is not None,
                }
            )
    else:
        raise ValueError(f"feed: unknown root <{kind}> — quarantine")
    return {"kind": kind, "title": title, "entries": entries}


def validate_entry(entry: dict) -> tuple[bool, str]:
    """Documented precedence: link first (an entry you cannot fetch is
    useless to a crawler), then the stable id dedup needs."""
    if not entry.get("link"):
        return False, "missing-link"
    if not entry.get("entry_id"):
        return False, "missing-id"
    return True, "ok"
