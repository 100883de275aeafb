"""WebVTT / SRT caption parsing — cue timing + text extraction, loud
malformation quarantine.

Crawled video rarely ships transcripts as clean text: it ships caption
sidecars, WebVTT (the W3C web standard) and SubRip SRT (the de-facto
archive format). For a training-data pipeline these ARE the documents
— the extraction pass must produce (start, end, text) cues exactly, or
quarantine, because a silently mis-parsed timestamp shears every
alignment downstream.

Public formats:
- WebVTT (W3C): ``WEBVTT`` signature line, blank-line-separated cue
  blocks, optional cue identifiers, ``HH:MM:SS.mmm --> HH:MM:SS.mmm``
  timings (hours optional), ``NOTE``/``STYLE``/``REGION`` blocks
  skipped, ``-->`` required with surrounding whitespace.
- SRT: 1-based integer index line, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
  (comma decimal separator), text until a blank line.

Both parsers return cues as (index, start_ms, end_ms, text) with
multi-line text joined by ``\\n``. Malformed timings, reversed ranges,
non-contiguous SRT indices and missing signatures raise ValueError —
callers quarantine, never guess.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_webvtt", "parse_srt", "parse_ttml",
    "encode_webvtt", "encode_srt", "encode_ttml",
]

_VTT_TS = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")
_SRT_TS = re.compile(r"^(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})$")


def _ts_ms(tok: str, rx: re.Pattern, what: str) -> int:
    m = rx.match(tok)
    if not m:
        raise ValueError(f"malformed {what} timestamp {tok!r}")
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


def _timing(line: str, rx: re.Pattern, what: str) -> tuple[int, int]:
    parts = line.split("-->")
    if len(parts) != 2:
        raise ValueError(f"{what} cue without '-->': {line!r}")
    # WebVTT allows cue settings after the end timestamp
    end_tok = parts[1].strip().split()[0] if parts[1].strip() else ""
    start = _ts_ms(parts[0].strip(), rx, what)
    end = _ts_ms(end_tok, rx, what)
    if end <= start:
        raise ValueError(f"{what} cue with non-positive duration: {line!r}")
    return start, end


def _blocks(text: str) -> list[list[str]]:
    out: list[list[str]] = []
    cur: list[str] = []
    for line in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if line.strip() == "":
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(line)
    if cur:
        out.append(cur)
    return out


def parse_webvtt(text: str) -> list[tuple[int, int, int, str]]:
    """WebVTT -> [(cue_index, start_ms, end_ms, text)]. The signature
    line must start with WEBVTT; NOTE/STYLE/REGION blocks are skipped;
    an optional identifier line may precede the timing line."""
    blocks = _blocks(text)
    if not blocks or not blocks[0][0].startswith("WEBVTT"):
        raise ValueError("missing WEBVTT signature")
    header = blocks[0]
    # the signature block may carry cue lines directly after WEBVTT
    rest = blocks[1:]
    if len(header) > 1:
        rest = [header[1:]] + rest
    cues: list[tuple[int, int, int, str]] = []
    idx = 0
    for block in rest:
        if block[0].split(" ", 1)[0] in ("NOTE", "STYLE", "REGION"):
            continue
        lines = block
        if "-->" not in lines[0]:
            if len(lines) < 2 or "-->" not in lines[1]:
                raise ValueError(
                    f"cue block without a timing line: {lines[0]!r}"
                )
            lines = lines[1:]  # identifier line
        start, end = _timing(lines[0], _VTT_TS, "WebVTT")
        cues.append((idx, start, end, "\n".join(lines[1:])))
        idx += 1
    return cues


def parse_srt(text: str) -> list[tuple[int, int, int, str]]:
    """SRT -> [(cue_index, start_ms, end_ms, text)]; indices must be
    1-based and contiguous (renumbered files are the #1 source of
    silent cue drops — refuse instead)."""
    cues: list[tuple[int, int, int, str]] = []
    for n, block in enumerate(_blocks(text), start=1):
        if not block[0].strip().isdigit():
            raise ValueError(f"SRT block without an index line: {block[0]!r}")
        if int(block[0]) != n:
            raise ValueError(
                f"non-contiguous SRT index {block[0]!r} (expected {n})"
            )
        if len(block) < 2:
            raise ValueError(f"SRT cue {n} without a timing line")
        start, end = _timing(block[1], _SRT_TS, "SRT")
        cues.append((n - 1, start, end, "\n".join(block[2:])))
    return cues


def _fmt_ms(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def encode_webvtt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text)] -> WebVTT, with a NOTE block the
    parser must skip."""
    out = ["WEBVTT", "", "NOTE generated fixture", ""]
    for start, end, text in cues:
        out.append(f"{_fmt_ms(start, '.')} --> {_fmt_ms(end, '.')}")
        out.append(text)
        out.append("")
    return "\n".join(out)


def encode_srt(cues: list[tuple[int, int, str]]) -> str:
    out = []
    for i, (start, end, text) in enumerate(cues, start=1):
        out.append(str(i))
        out.append(f"{_fmt_ms(start, ',')} --> {_fmt_ms(end, ',')}")
        out.append(text)
        out.append("")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# TTML (W3C Timed Text Markup Language) — the broadcast/streaming
# caption format next to WebVTT/SRT (r9-continued).
# ---------------------------------------------------------------------------
_TTML_CLOCK = re.compile(r"^(\d{2,}):([0-5]\d):([0-5]\d)(?:\.(\d{1,3}))?$")
_TTML_OFFSET = re.compile(r"^(\d+(?:\.\d+)?)(h|ms|m|s)$")
_TTML_SCALE = {"h": 3_600_000, "m": 60_000, "s": 1_000, "ms": 1}


def _ttml_ms(tok: str) -> int:
    """TTML time expression -> ms: clock-time HH:MM:SS(.fff) or
    offset-time <n>(h|m|s|ms). Frame-based expressions (HH:MM:SS:FF or
    the 'f'/'t' metrics) need ttp:frameRate/tickRate context we refuse
    to guess — ValueError, callers quarantine."""
    tok = tok.strip()
    m = _TTML_CLOCK.match(tok)
    if m:
        frac = (m.group(4) or "0").ljust(3, "0")
        return (
            (int(m.group(1)) * 60 + int(m.group(2))) * 60 + int(m.group(3))
        ) * 1000 + int(frac)
    m = _TTML_OFFSET.match(tok)
    if m:
        return int(round(float(m.group(1)) * _TTML_SCALE[m.group(2)]))
    raise ValueError(f"unsupported TTML time expression {tok!r}")


def _ttml_text(el) -> str:
    """Flatten a <p>'s content: nested spans inline, <br/> -> newline."""
    parts: list[str] = []
    if el.text:
        parts.append(el.text)
    for child in el:
        if child.tag.rpartition("}")[2] == "br":
            parts.append("\n")
        else:
            parts.append(_ttml_text(child))
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def parse_ttml(text: str) -> list[tuple[int, int, int, str]]:
    """TTML -> [(cue_index, start_ms, end_ms, text)] over every <p> in
    document order. ``begin`` is required; ``end`` or ``dur`` closes
    the cue. Malformed XML, a non-<tt> root, missing/unsupported
    timings and non-positive durations raise ValueError."""
    import xml.etree.ElementTree as ET

    if "<!DOCTYPE" in text or "<!ENTITY" in text:
        # caption sidecars are untrusted crawl input: DTD entity
        # expansion (billion laughs) is refused, never expanded
        raise ValueError("TTML: DTD/entities not allowed — quarantine")
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise ValueError(f"malformed TTML XML: {e}") from e
    if root.tag.rpartition("}")[2] != "tt":
        raise ValueError(f"TTML root is <{root.tag}>, not <tt>")
    cues: list[tuple[int, int, int, str]] = []
    idx = 0
    for p in root.iter():
        if p.tag.rpartition("}")[2] != "p":
            continue
        begin = p.get("begin")
        if begin is None:
            raise ValueError("TTML <p> without begin")
        start = _ttml_ms(begin)
        if p.get("end") is not None:
            end = _ttml_ms(p.get("end"))
        elif p.get("dur") is not None:
            end = start + _ttml_ms(p.get("dur"))
        else:
            raise ValueError("TTML <p> without end or dur")
        if end <= start:
            raise ValueError("TTML cue with non-positive duration")
        cues.append((idx, start, end, _ttml_text(p).strip()))
        idx += 1
    return cues


def encode_ttml(cues: list[tuple[int, int, str]]) -> str:
    """Canonical TTML document for fixtures/roundtrips: clock-time
    timings, <br/> for embedded newlines, XML-escaped text."""
    from xml.sax.saxutils import escape

    ps = []
    for start, end, text in cues:
        body = "<br/>".join(escape(line) for line in text.split("\n"))
        ps.append(
            f'<p begin="{_fmt_ms(start, ".")}" end="{_fmt_ms(end, ".")}">'
            f"{body}</p>"
        )
    return (
        '<tt xmlns="http://www.w3.org/ns/ttml"><body><div>'
        + "".join(ps)
        + "</div></body></tt>"
    )
