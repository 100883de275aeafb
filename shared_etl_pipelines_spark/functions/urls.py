"""URL canonicalization (RFC 3986 §6) — the key-normalization step of
crawl dedup.

Two fetches of the same resource rarely carry byte-identical URLs:
schemes and hosts differ in case, default ports appear and disappear,
percent-encodings of unreserved characters vary, paths carry ``./`` and
``../`` segments, fragments never reach the server. URL-keyed dedup
(and politeness bucketing, and robots evaluation) must canonicalize
first or it silently treats one document as many.

Implemented normalizations (all RFC 3986 §6.2.2-6.2.3, syntax-based —
no network, no scheme-specific guessing beyond default ports):

- scheme and host lowercased;
- default ports dropped (http:80, https:443);
- percent-encoding: unreserved characters decoded (%41 -> A,
  %7E -> ~), all other escapes uppercased (%3a -> %3A); a stray ``%``
  not followed by two hex digits raises (quarantine, not a guess);
- dot-segments removed from the path (the §5.2.4 algorithm);
- empty path -> ``/`` when an authority is present;
- the fragment is dropped;
- query strings keep their order (reordering changes semantics on many
  servers — deliberately NOT done).

Out of scope (quarantines loudly rather than mis-keying): IPv6 host
literals (``[::1]`` — the ':' inside brackets fails the authority
grammar here), IDN/punycode host folding, and scheme-relative URLs.

Pure string algorithm in plain python — used inside Arrow-batched
mapInPandas; the oracle replays fixtures in closed form.
"""

from __future__ import annotations

import re

__all__ = ["canonicalize_url"]

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#:]*)(?::(?P<port>\d*))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)


def _norm_escapes(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%":
            hexpair = s[i + 1 : i + 3]
            if len(hexpair) != 2 or not re.fullmatch(r"[0-9A-Fa-f]{2}", hexpair):
                raise ValueError(f"malformed percent-escape at {i} in {s!r}")
            ch = chr(int(hexpair, 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hexpair.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            m = re.match(r"^/?[^/]*", inp)
            out.append(m.group(0))
            inp = inp[m.end():]
    return "".join(out)


def canonicalize_url(url: str) -> str:
    """Syntax-based canonical form of an absolute http(s)-style URL.
    Malformed input (no scheme/authority, broken escapes) raises
    ValueError — dedup keys must never be guessed."""
    m = _URL_RE.match(url.strip())
    if not m:
        raise ValueError(f"not an absolute URL: {url!r}")
    scheme = m.group("scheme").lower()
    host = _norm_escapes(m.group("host")).lower()
    if not host:
        raise ValueError(f"URL without a host: {url!r}")
    port = m.group("port")
    path = _remove_dot_segments(_norm_escapes(m.group("path") or ""))
    if not path:
        path = "/"
    query = m.group("query")
    authority = host
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        authority += f":{port}"
    out = f"{scheme}://{authority}{path}"
    if query is not None:
        out += "?" + _norm_escapes(query)
    return out
