"""Pure-python PDF text extraction — xref walk, Flate content
streams, BT/ET + Tj/TJ/'/" text operators.

PDFs are a major share of any crawled document corpus; before this
module they had no path into the curation funnel (VERDICT r7 missing
#2). The structure implemented here is the public ISO 32000-1 core:

- ``startxref`` -> classic cross-reference TABLE -> ``trailer`` dict
  (incremental updates follow ``/Prev`` chains; newest offset wins)
- object grammar: dictionaries, arrays, names, numbers, literal
  ``(...)`` strings (with escapes and balanced parens), hex ``<...>``
  strings, booleans/null, ``N G R`` indirect references
- ``/Root`` catalog -> ``/Pages`` tree (nested ``/Kids``) -> per-page
  ``/Contents`` (single stream or array), ``/Length`` possibly
  indirect
- stream filters: none or ``/FlateDecode`` (zlib, same dependency the
  PNG codec already uses)
- text: ``BT``/``ET`` blocks; ``Tj`` shows a string, ``'`` and ``"``
  show with a leading newline, ``TJ`` shows an array interleaving
  strings with kern numbers; ``Td``/``TD``/``T*`` vertical moves
  emit newlines so extracted text keeps line structure

Out of scope, REFUSED LOUDLY (ValueError naming the feature, so
callers quarantine with the reason instead of emitting garbage):
encryption (``/Encrypt``), cross-reference STREAMS (``/Type /XRef``),
object streams, and any stream filter other than FlateDecode. Fonts
and glyph metrics are not needed: fixture and crawl-text extraction
read the string operands, the same contract pdftotext-style tools
implement for unencoded Latin-1 text.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["is_pdf", "extract_pdf_text", "encode_pdf", "parse_pdf_pages"]


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object reader over ``data`` starting at ``pos``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        while self.pos < len(d):
            c = d[self.pos : self.pos + 1]
            if c in b"%":  # comment to EOL
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl < 0 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def read_object(self):
        self._skip_ws()
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("unexpected end of PDF object data")
        c = d[p : p + 1]
        if d[p : p + 2] == b"<<":
            return self._read_dict()
        if c == b"<":
            return self._read_hex_string()
        if c == b"(":
            return self._read_literal_string()
        if c == b"[":
            return self._read_array()
        if c == b"/":
            return self._read_name()
        if d[p : p + 4] == b"true":
            self.pos += 4
            return True
        if d[p : p + 5] == b"false":
            self.pos += 5
            return False
        if d[p : p + 4] == b"null":
            self.pos += 4
            return None
        m = re.match(rb"[+-]?\d*\.?\d+", d[p : p + 64])
        if m:
            tok = m.group(0)
            # indirect reference lookahead: "N G R"
            mref = re.match(rb"(\d+)\s+(\d+)\s+R(?![\w])", d[p : p + 64])
            if mref and b"." not in tok:
                self.pos += mref.end()
                return ("ref", int(mref.group(1)), int(mref.group(2)))
            self.pos += len(tok)
            return float(tok) if b"." in tok else int(tok)
        raise ValueError(f"unparsable PDF token at byte {p}: {d[p:p+16]!r}")

    def _read_name(self) -> str:
        d = self.data
        self.pos += 1
        start = self.pos
        while self.pos < len(d) and d[self.pos : self.pos + 1] not in (
            _WS + _DELIM
        ):
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        return re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        ).decode("latin-1")

    def _read_dict(self) -> dict:
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.read_object()
            if not isinstance(key, str):
                raise ValueError("PDF dict key is not a name")
            out[key] = self.read_object()

    def _read_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.read_object())

    def _read_hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1 : end])
        if len(hx) % 2:
            hx += b"0"
        self.pos = end + 1
        return bytes.fromhex(hx.decode("ascii"))

    def _read_literal_string(self) -> bytes:
        d = self.data
        p = self.pos + 1
        depth = 1
        out = bytearray()
        while p < len(d):
            c = d[p]
            if c == 0x5C:  # backslash
                p += 1
                e = d[p : p + 1]
                if not e:
                    # b'' is a substring of everything — without this
                    # guard a trailing bare backslash raised KeyError
                    # instead of the documented ValueError (review r8 #7)
                    raise ValueError("literal string ends in a bare backslash")
                if e in b"nrtbf":
                    out += {
                        b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\x0c",
                    }[e]
                    p += 1
                elif e in b"()\\":
                    out += e
                    p += 1
                elif e == b"\n":
                    p += 1  # line continuation
                else:
                    m = re.match(rb"[0-7]{1,3}", d[p : p + 3])
                    if m:
                        out.append(int(m.group(0), 8) & 0xFF)
                        p += len(m.group(0))
                    else:
                        out += e
                        p += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        raise ValueError("unterminated literal string")


class _Pdf:
    def __init__(self, data: bytes):
        if not is_pdf(data):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.data = data
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._read_xref_chain()
        if "Encrypt" in self.trailer:
            raise ValueError("encrypted PDF: decryption out of scope — quarantine")
        if "Root" not in self.trailer:
            raise ValueError("PDF trailer has no /Root")

    def _read_xref_chain(self) -> None:
        tail = self.data[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF has no startxref")
        off = int(m.group(1))
        seen = set()
        while True:
            if off in seen or off >= len(self.data):
                raise ValueError("broken PDF xref chain")
            seen.add(off)
            lex = _Lexer(self.data, off)
            lex._skip_ws()
            if self.data[lex.pos : lex.pos + 4] != b"xref":
                # cross-reference STREAM (PDF 1.5+) — refuse loudly
                raise ValueError(
                    "cross-reference stream (PDF 1.5 /XRef) unsupported — quarantine"
                )
            lex.pos += 4
            while True:
                lex._skip_ws()
                if self.data[lex.pos : lex.pos + 7] == b"trailer":
                    lex.pos += 7
                    break
                mhead = re.match(
                    rb"(\d+)\s+(\d+)", self.data[lex.pos : lex.pos + 64]
                )
                if not mhead:
                    raise ValueError("malformed xref subsection header")
                start, count = int(mhead.group(1)), int(mhead.group(2))
                lex.pos += mhead.end()
                lex._skip_ws()
                for i in range(count):
                    ent = self.data[lex.pos : lex.pos + 20]
                    ment = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", ent)
                    if not ment:
                        raise ValueError("malformed xref entry")
                    # FREE entries must also claim their object number:
                    # an object freed by the NEWEST update would
                    # otherwise be resurrected from an older section's
                    # offset via the /Prev chain (review r8 #5)
                    off_val = (
                        int(ment.group(1)) if ment.group(3) == b"n" else -1
                    )
                    self.xref.setdefault(start + i, off_val)
                    lex.pos += ment.end()
                    lex._skip_ws()
            trailer = lex.read_object()
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Prev" in trailer:
                off = int(trailer["Prev"])
                continue
            return

    def resolve(self, obj):
        # Cycle guard: an object whose body is a self- or mutually-
        # referential indirect reference ("1 0 obj 1 0 R endobj") would
        # otherwise spin this loop forever on a crafted/corrupt blob
        # instead of quarantining (advice r8 #1).
        seen: set[int] = set()
        while isinstance(obj, tuple) and obj and obj[0] == "ref":
            if obj[1] in seen:
                raise ValueError(
                    "circular indirect reference — quarantine"
                )
            seen.add(obj[1])
            obj = self.get_object(obj[1])
        return obj

    def get_object(self, num: int):
        if num not in self.xref:
            raise ValueError(f"object {num} not in xref")
        if self.xref[num] < 0:
            raise ValueError(f"object {num} is freed by an incremental update")
        lex = _Lexer(self.data, self.xref[num])
        mo = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[lex.pos : lex.pos + 64])
        if not mo or int(mo.group(1)) != num:
            raise ValueError(f"xref offset for object {num} does not hold it")
        lex.pos += mo.end()
        obj = lex.read_object()
        lex._skip_ws()
        if self.data[lex.pos : lex.pos + 6] == b"stream":
            if not isinstance(obj, dict):
                raise ValueError("stream without a dictionary")
            p = lex.pos + 6
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(obj.get("Length"))
            if not isinstance(length, int) or p + length > len(self.data):
                raise ValueError("stream /Length missing or out of bounds")
            raw = self.data[p : p + length]
            obj = dict(obj)
            obj["__stream__"] = self._decode_stream(obj, raw)
        return obj

    def _decode_stream(self, d: dict, raw: bytes) -> bytes:
        filt = d.get("Filter")
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise ValueError(f"corrupt Flate stream: {e}") from None
            else:
                raise ValueError(
                    f"unsupported stream filter /{f} — quarantine"
                )
        return raw

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []
        # Object numbers already visited in this walk: a page tree whose
        # /Kids reference an ancestor would otherwise recurse forever
        # (advice r8 #1 — quarantine loudly instead).
        visited: set[int] = set()

        def walk(node) -> None:
            if isinstance(node, tuple) and node and node[0] == "ref":
                if node[1] in visited:
                    raise ValueError(
                        "circular page-tree reference — quarantine"
                    )
                visited.add(node[1])
            node = self.resolve(node)
            t = node.get("Type")
            if t == "Pages" or (t is None and "Kids" in node):
                for kid in self.resolve(node.get("Kids", [])):
                    walk(kid)
            elif t == "Page":
                out.append(node)
            else:
                raise ValueError(f"unexpected page-tree node type {t!r}")

        walk(root.get("Pages"))
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, dict):
            streams = [contents]
        else:
            streams = [self.resolve(c) for c in contents]
        return b"\n".join(s.get("__stream__", b"") for s in streams)


# content-stream tokens we care about: strings, arrays, operators
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _extract_text_ops(content: bytes) -> str:
    """Walk a content stream; emit shown strings in order. ``Td``/
    ``TD``/``T*``/``'``/``\"`` start new lines; BT blocks separate with
    newlines too."""
    lex = _Lexer(content, 0)
    parts: list[str] = []
    stack: list = []
    in_text = False

    def show(obj) -> None:
        if isinstance(obj, bytes):
            parts.append(obj.decode("latin-1"))

    while True:
        lex._skip_ws()
        if lex.pos >= len(content):
            break
        c = content[lex.pos : lex.pos + 1]
        if c in b"([</" or c.isdigit() or c in b"+-.":
            try:
                stack.append(lex.read_object())
                continue
            except ValueError:
                pass  # fall through to operator scan
        m = _OP_RE.match(content, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group(0)
        lex.pos = m.end()
        if op == b"BT":
            if in_text and parts and parts[-1] != "\n":
                parts.append("\n")
            in_text = True
        elif op == b"ET":
            in_text = False
            if parts and parts[-1] != "\n":
                parts.append("\n")
        elif op == b"Tj" and in_text:
            if stack:
                show(stack[-1])
        elif op in (b"'", b'"') and in_text:
            if parts and parts[-1] != "\n":
                parts.append("\n")
            if stack:
                show(stack[-1])
        elif op == b"TJ" and in_text:
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    show(el)
        elif op in (b"Td", b"TD", b"T*") and in_text:
            if parts and parts[-1] != "\n":
                parts.append("\n")
        stack.clear()  # operands bind to the operator just consumed
    text = "".join(parts)
    # drop empty lines (operator-structure newlines) but PRESERVE
    # whitespace inside kept lines — a trailing .strip() here erased
    # whitespace-only show strings (round-8 property sweep)
    return "\n".join(line for line in text.split("\n") if line != "")


def parse_pdf_pages(data: bytes) -> list[str]:
    """Per-page extracted text. Raises ValueError (with the reason) on
    anything outside the documented scope — the quarantine signal."""
    pdf = _Pdf(data)
    return [_extract_text_ops(pdf.page_content(p)) for p in pdf.pages()]


def extract_pdf_text(data: bytes) -> str:
    """Whole-document text: pages joined by form-feed-free newlines."""
    return "\n".join(parse_pdf_pages(data))


# ---------------------------------------------------------------------------
# Encoder — fixture-grade but structurally real: classic xref table,
# page tree, one FlateDecode content stream per page, Helvetica font.
# ---------------------------------------------------------------------------
def _pdf_escape(s: str) -> bytes:
    return (
        s.encode("latin-1")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def encode_pdf(
    pages: list[list[str]],
    compress: bool = True,
    info: dict | None = None,
) -> bytes:
    """``pages`` is a list of pages, each a list of text LINES. Every
    page becomes one content stream: first line shown with ``Tj``,
    later lines alternate ``TJ`` arrays (split mid-line with a kern
    number, exercising array reassembly) and ``'`` next-line shows.
    ``info`` adds a document-information dictionary (/Info in the
    trailer) with string values — Title/Author/Producer/CreationDate
    etc.; ``None`` leaves the file byte-identical to before this
    parameter existed."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, lines in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cnum} 0 R /Resources << /Font << /F1 "
            f"{font_num} 0 R >> >> >>"
        ).encode()
        body = bytearray(b"BT /F1 12 Tf 72 720 TL 72 720 Td\n")
        for j, line in enumerate(lines):
            if j == 0:
                body += b"(" + _pdf_escape(line) + b") Tj\n"
            elif j % 2:
                half = len(line) // 2
                body += (
                    b"T* [("
                    + _pdf_escape(line[:half])
                    + b") -250 ("
                    + _pdf_escape(line[half:])
                    + b")] TJ\n"
                )
            else:
                body += b"(" + _pdf_escape(line) + b") '\n"
        body += b"ET"
        stream = zlib.compress(bytes(body)) if compress else bytes(body)
        head = f"<< /Length {len(stream)}" + (
            " /Filter /FlateDecode >>" if compress else " >>"
        )
        objs[cnum] = (
            head.encode() + b"\nstream\n" + stream + b"\nendstream"
        )
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    info_num = None
    if info is not None:
        info_num = font_num + 1
        body = b"<<"
        for k, v in info.items():
            body += f" /{k} (".encode() + _pdf_escape(str(v)) + b")"
        objs[info_num] = body + b" >>"
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    info_part = f" /Info {info_num} 0 R" if info_num is not None else ""
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R{info_part} >>\n"
        f"startxref\n{xref_off}\n%%EOF"
    ).encode()
    return bytes(out)


def pdf_document_info(data: bytes) -> dict:
    """Document-information dictionary (/Info in the trailer): the
    provenance metadata a corpus audit reads — Title/Author/Producer/
    Creator/CreationDate/ModDate. Author and creation timestamps are
    PII-adjacent provenance a curation pass must SEE. Returns
    ``{"has_info": bool, "n_pages": int, fields...}`` with absent
    fields as ''; malformed PDFs raise (the extract_pdf_text
    quarantine contract)."""
    pdf = _Pdf(data)
    out = {
        "has_info": False, "n_pages": len(pdf.pages()),
        "title": "", "author": "", "producer": "", "creator": "",
        "creation_date": "", "mod_date": "",
    }
    ref = pdf.trailer.get("Info")
    if ref is None:
        return out
    info = pdf.resolve(ref)
    if not isinstance(info, dict):
        raise ValueError("PDF /Info is not a dictionary — quarantine")
    out["has_info"] = True
    keymap = {
        "Title": "title", "Author": "author", "Producer": "producer",
        "Creator": "creator", "CreationDate": "creation_date",
        "ModDate": "mod_date",
    }
    for k, field in keymap.items():
        v = info.get(k)
        if v is None:
            continue
        v = pdf.resolve(v)
        if not isinstance(v, bytes):
            raise ValueError(f"PDF /Info /{k} is not a string — quarantine")
        out[field] = v.decode("latin-1")
    return out
