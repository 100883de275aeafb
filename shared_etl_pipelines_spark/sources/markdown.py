"""Markdown structure census (CommonMark-subset, deterministic).

Documentation and code corpora ship as Markdown; curation needs the
STRUCTURE, not just the text: code-fence share drives code-vs-prose
mixing ratios, heading depth profiles catch scraped-navigation junk,
link density is a boilerplate signal. This is a line-level census of
the CommonMark constructs those decisions read — ATX headings, fenced
code blocks with info strings, inline links — not a full renderer.

Rules (CommonMark where it matters, documented where simplified):
- fenced code: a line starting with ``` opens a block; its first word
  is the info-string language; the next line starting with ``` closes
  it. An unterminated fence runs to EOF (CommonMark behavior) and is
  FLAGGED, because in a crawl corpus it usually means truncation.
- ATX headings: 1-6 ``#`` followed by a space, outside code.
- inline links: ``[text](url)`` outside code.
- prose tokens: whitespace tokens of non-heading, non-fence,
  out-of-code lines.
"""
from __future__ import annotations

import re

__all__ = ["parse_markdown_structure"]

_HEADING_RX = re.compile(r"^(#{1,6})\s+\S")
_LINK_RX = re.compile(r"\[[^\]]*\]\([^)]*\)")


def parse_markdown_structure(text: str) -> dict:
    headings: list[int] = []
    code_langs: list[str] = []
    n_code_lines = 0
    n_links = 0
    prose_tokens = 0
    in_code = False
    unterminated = False
    for line in text.split("\n"):
        if line.startswith("```"):
            if in_code:
                in_code = False
            else:
                in_code = True
                info = line[3:].strip()
                code_langs.append(info.split()[0] if info else "")
            continue
        if in_code:
            n_code_lines += 1
            continue
        m = _HEADING_RX.match(line)
        if m:
            headings.append(len(m.group(1)))
            continue
        n_links += len(_LINK_RX.findall(line))
        prose_tokens += len(line.split())
    if in_code:
        unterminated = True
    return {
        "n_headings": len(headings),
        "max_depth": max(headings) if headings else 0,
        "n_code_blocks": len(code_langs),
        "code_langs": ",".join(code_langs),
        "n_code_lines": n_code_lines,
        "n_links": n_links,
        "prose_tokens": prose_tokens,
        "unterminated": unterminated,
    }
