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


# ---------------------------------------------------------------------------
# FTP wire replay (r11): same philosophy as the HTTP layer, one level
# lower. ftplib has no handler chain, so the fake sits at the SOCKET
# boundary: ``socket.create_connection`` is swapped inside the context
# and serves scripted control/data sockets. Everything above — command
# formatting, multi-line reply parsing, the 227 PASV address parse,
# the 1xx-then-226 transfer lifecycle, error_perm on 5xx — is the
# production ftplib machinery, which is the point: S1's protocol
# branches (tree walk via NLST + CWD probing, RETR, login, timeout
# propagation) execute against recorded wire bytes instead of only the
# file:// fixture path.
# ---------------------------------------------------------------------------


class _ReplayControlFile:
    """The text file ftplib reads replies from (sock.makefile('r'))."""

    def __init__(self, session: "ReplayFTPSession") -> None:
        self._session = session

    def readline(self, *a) -> str:
        q = self._session._resp_queue
        if not q:
            raise AssertionError("ftp replay: ftplib read past the script")
        return q.pop(0) + "\r\n"

    def close(self) -> None:
        pass


class _ReplayControlSocket:
    def __init__(self, session: "ReplayFTPSession") -> None:
        import socket as _s

        self.family = _s.AF_INET
        self._session = session

    def makefile(self, *a, **k) -> _ReplayControlFile:
        return _ReplayControlFile(self._session)

    def getpeername(self) -> tuple[str, int]:
        # ftplib distrusts the 227 address by default and dials the
        # data port at the CONTROL peer's address — honor that
        return (self._session.host, 21)

    def sendall(self, data: bytes) -> None:
        line = data.decode("latin-1").rstrip("\r\n")
        self._session._handle(line)

    def close(self) -> None:
        pass


class _ReplayDataSocket:
    """Passive-mode data connection; payload filled when the transfer
    command arrives (ftplib connects the data socket FIRST)."""

    def __init__(self) -> None:
        import socket as _s

        self.family = _s.AF_INET
        self._buf = b""

    def recv(self, n: int) -> bytes:
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def makefile(self, mode="r", **k):
        import io as _io

        raw = _io.BytesIO(self._buf)
        if "b" in mode:
            return raw
        return _io.TextIOWrapper(raw, encoding=k.get("encoding", "latin-1"))

    def close(self) -> None:
        pass

    def __enter__(self) -> "_ReplayDataSocket":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class ReplayFTPSession:
    """Scripted FTP server. ``dirs`` is the set of directory paths (CWD
    succeeds), ``listings`` maps a path to its NLST entry lines, and
    ``files`` maps a path to RETR bytes; anything else answers 550.
    Records every command line in ``commands`` and every
    create_connection (host, port, timeout) in ``connects``. Any
    connection to a host other than the scripted one raises — a replay
    run must never reach the network."""

    def __init__(
        self,
        host: str,
        dirs: set[str],
        listings: dict[str, list[str]],
        files: dict[str, bytes],
    ) -> None:
        self.host = host
        self.dirs = set(dirs)
        self.listings = dict(listings)
        self.files = dict(files)
        self.commands: list[str] = []
        self.connects: list[tuple[str, int, object]] = []
        self._resp_queue: list[str] = []
        self._armed: _ReplayDataSocket | None = None
        self._next_port = 40001
        self._data_ports: dict[int, _ReplayDataSocket] = {}
        self._orig = None

    # -- command dispatch (one scripted server, RFC 959 happy paths) ----
    def _handle(self, line: str) -> None:
        self.commands.append(line)
        cmd, _, arg = line.partition(" ")
        cmd = cmd.upper()
        if cmd == "USER":
            self._resp_queue.append("331 password required")
        elif cmd == "PASS":
            self._resp_queue.append("230 logged in")
        elif cmd == "TYPE":
            self._resp_queue.append("200 type set")
        elif cmd == "PASV":
            port = self._next_port
            self._next_port += 1
            sock = _ReplayDataSocket()
            self._data_ports[port] = sock
            self._armed = sock
            self._resp_queue.append(
                f"227 Entering Passive Mode (127,0,0,1,{port >> 8},{port & 0xFF})"
            )
        elif cmd == "CWD":
            self._resp_queue.append(
                "250 ok" if arg in self.dirs else "550 not a directory"
            )
        elif cmd == "NLST":
            names = self.listings.get(arg)
            if names is None:
                self._resp_queue.append("550 no such path")
            else:
                if self._armed is None:
                    raise AssertionError("ftp replay: NLST before PASV")
                self._armed._buf = (
                    ("\r\n".join(names) + "\r\n").encode() if names else b""
                )
                self._resp_queue += ["150 listing follows", "226 done"]
        elif cmd == "RETR":
            body = self.files.get(arg)
            if body is None:
                self._resp_queue.append("550 no such file")
            else:
                if self._armed is None:
                    raise AssertionError("ftp replay: RETR before PASV")
                self._armed._buf = body
                self._resp_queue += ["150 opening binary", "226 done"]
        elif cmd == "QUIT":
            self._resp_queue.append("221 bye")
        else:
            self._resp_queue.append(f"502 {cmd} not scripted")

    # -- the socket boundary ---------------------------------------------
    def _create_connection(self, address, timeout=None, source_address=None):
        host, port = address
        self.connects.append((host, port, timeout))
        if port in self._data_ports:
            return self._data_ports.pop(port)
        if host != self.host:
            raise AssertionError(
                f"ftp replay: unscripted connection to {host}:{port} — a "
                "replay run must never reach the network"
            )
        self._resp_queue.append("220 replay FTP ready")
        return _ReplayControlSocket(self)

    def __enter__(self) -> "ReplayFTPSession":
        import socket as _s

        self._orig = _s.create_connection
        _s.create_connection = self._create_connection
        return self

    def __exit__(self, *exc) -> None:
        import socket as _s

        _s.create_connection = self._orig

    def sent(self, prefix: str) -> list[str]:
        return [c for c in self.commands if c.upper().startswith(prefix.upper())]
