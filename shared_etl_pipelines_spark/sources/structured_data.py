"""JSON-LD (schema.org) structured-data extraction from HTML.

Crawl pipelines mine embedded ``<script type="application/ld+json">``
blocks for high-precision metadata — article headlines, product
facts, breadcrumbs — that plain text extraction loses. This is the
dominant structured-data syntax on the open web (schema.org +
W3C JSON-LD, both public specs).

Extraction contract:

- script blocks are located case-insensitively with either quote
  style and any attribute order;
- each block must parse as STRICT JSON (the JSON-LD data model) — a
  malformed block quarantines as a visible per-block error, without
  killing the other blocks in the document;
- a block may hold one entity, a top-level array of entities, or an
  ``@graph`` container; all three flatten to (script_idx, entity_idx,
  entity) rows in document order;
- non-object entities inside arrays/graphs (strings, numbers) are a
  data defect and quarantine that block loudly.
"""
from __future__ import annotations

import json
import re

__all__ = ["extract_json_ld"]

_LDJSON_RX = re.compile(
    r"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)"
    r"</script\s*>",
    re.IGNORECASE | re.DOTALL,
)


def extract_json_ld(
    html: str,
) -> tuple[list[tuple[int, int, dict]], list[tuple[int, str]]]:
    """HTML -> (entities, errors).

    ``entities``: (script_idx, entity_idx, entity_dict) in document
    order. ``errors``: (script_idx, reason) for blocks that fail the
    strict-JSON or object-shape contract."""
    entities: list[tuple[int, int, dict]] = []
    errors: list[tuple[int, str]] = []
    for si, m in enumerate(_LDJSON_RX.finditer(html)):
        try:
            data = json.loads(m.group(1))
        except json.JSONDecodeError:
            errors.append((si, "bad-json"))
            continue
        if isinstance(data, dict) and "@graph" in data:
            items = data["@graph"]
            if not isinstance(items, list):
                errors.append((si, "bad-graph"))
                continue
        elif isinstance(data, list):
            items = data
        elif isinstance(data, dict):
            items = [data]
        else:
            errors.append((si, "non-object"))
            continue
        flat: list[dict] = []
        bad = False
        for item in items:
            if not isinstance(item, dict):
                bad = True
                break
            flat.append(item)
        if bad:
            errors.append((si, "non-object"))
            continue
        for ei, item in enumerate(flat):
            entities.append((si, ei, item))
    return entities, errors
