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

__all__ = ["parse_webvtt", "parse_srt", "encode_webvtt", "encode_srt"]

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
