"""Recorded-response HTTP replay for the live-ingestion code paths.

The sandbox has no network, so ``web_download_list`` /
``stac_asset_download`` have only ever exercised their ``file://``
fixture branches (VERDICT r9 "What's missing" #1). This layer lets the
REAL ``urllib`` branches — conditional GET with ``If-None-Match`` /
``If-Modified-Since`` and a 304 short-circuit, redirects, STAC
``rel=next`` pagination — run against canned wire bytes: a
``ReplaySession`` is installed as a ``urllib.request`` opener handler
ahead of the socket-backed ``HTTPHandler``, serves scripted responses
per (method, url), and records every request it saw (including the
conditional headers) for assertions.

Only the transport is faked; everything above it (request building,
redirect following via the stock ``HTTPRedirectHandler``, the
``HTTPError`` raised for 304/4xx, header parsing) is the production
``urllib`` machinery. Responses are consumed in order per URL, so a
script can answer the first GET with 200 + ETag and the second with
304 — the exact conditional-GET handshake.
"""

from __future__ import annotations

import email.message
import io
import urllib.request
import urllib.response
from dataclasses import dataclass, field


@dataclass
class Recorded:
    """One canned wire response."""

    status: int = 200
    body: bytes = b""
    headers: dict[str, str] = field(default_factory=dict)
    reason: str = ""


@dataclass
class Seen:
    """One request the replay transport observed."""

    method: str
    url: str
    headers: dict[str, str]
    body: bytes | None


class _ReplayHandler(urllib.request.BaseHandler):
    # run before the socket-backed HTTPHandler (handler_order 500):
    # every http/https open is answered from the script or refused
    handler_order = 100

    def __init__(self, session: "ReplaySession") -> None:
        self.session = session

    def _open(self, req: urllib.request.Request):
        return self.session._serve(req)

    http_open = _open
    https_open = _open


class ReplaySession:
    """Scripted transport. ``script`` maps (METHOD, url) -> list of
    ``Recorded`` responses, consumed left to right (the last one
    repeats). Unscripted URLs raise — a replay run must never touch a
    socket. Use as a context manager::

        with ReplaySession({("GET", u): [Recorded(body=b"x")]}) as rs:
            ...code under test...
        assert rs.requests[0].headers.get("If-none-match") == '"v1"'
    """

    def __init__(self, script: dict[tuple[str, str], list[Recorded]]) -> None:
        self.script = {
            (m.upper(), u): list(rs) for (m, u), rs in script.items()
        }
        self.requests: list[Seen] = []
        self._prev_opener = None

    # -- transport ------------------------------------------------------
    def _serve(self, req: urllib.request.Request):
        method = req.get_method().upper()
        url = req.full_url
        self.requests.append(
            Seen(
                method=method,
                url=url,
                headers=dict(req.header_items()),
                body=req.data if isinstance(req.data, bytes) else None,
            )
        )
        queue = self.script.get((method, url))
        if not queue:
            raise AssertionError(
                f"replay: unscripted request {method} {url} — a replay "
                "run must never reach the network"
            )
        rec = queue.pop(0) if len(queue) > 1 else queue[0]
        hdrs = email.message.Message()
        for k, v in rec.headers.items():
            hdrs[k] = v
        # ALWAYS return the raw response — the stock HTTPErrorProcessor
        # then routes it exactly like live urllib: 2xx passes through,
        # 3xx goes to HTTPRedirectHandler (which issues the follow-up
        # request through this same transport), 304/4xx/5xx become the
        # HTTPError the caller sees on a real socket.
        resp = urllib.response.addinfourl(
            io.BytesIO(rec.body), hdrs, url, rec.status
        )
        resp.msg = rec.reason or f"status {rec.status}"
        return resp

    # -- lifecycle ------------------------------------------------------
    def __enter__(self) -> "ReplaySession":
        self._prev_opener = urllib.request._opener
        opener = urllib.request.build_opener(_ReplayHandler(self))
        urllib.request.install_opener(opener)
        return self

    def __exit__(self, *exc) -> None:
        urllib.request.install_opener(self._prev_opener)

    # -- assertions -----------------------------------------------------
    def sent(self, method: str, url: str) -> list[Seen]:
        return [
            s
            for s in self.requests
            if s.method == method.upper() and s.url == url
        ]
