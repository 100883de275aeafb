"""iCalendar (RFC 5545) parsing — calendar corpora and meeting-data
pipelines.

The format's three genuinely tricky mechanics are implemented for
real, because naive line-splitting silently corrupts values:

- LINE UNFOLDING (§3.1): a CRLF (or bare LF — be liberal in what you
  accept) followed by a space or tab continues the previous line;
  folding may split a UTF-8 sequence or an escape mid-way, so
  unfolding happens BEFORE any other interpretation.
- content lines: ``NAME(;param=value)*:value`` with quoted parameter
  values that may contain ``:`` and ``;``.
- TEXT escaping (§3.3.11): ``\\n`` newline, ``\\,`` ``\\;`` ``\\\\``
  literals.

Structure: one VCALENDAR containing VEVENT blocks; BEGIN/END must
balance and nest properly or the file refuses. ORGANIZER surfaces as
its mailto DOMAIN only — the address itself stays out of audit
output (the email_mime_audit discipline).
"""
from __future__ import annotations

__all__ = ["parse_ics", "encode_ics", "parse_vcards", "encode_vcard"]


def _unfold(text: str) -> list[str]:
    lines: list[str] = []
    for raw in text.replace("\r\n", "\n").split("\n"):
        if raw.startswith((" ", "\t")) and lines:
            lines[-1] += raw[1:]
        elif raw:
            lines.append(raw)
    return lines


def _split_content_line(line: str) -> tuple[str, dict, str]:
    """NAME(;param=value)*:value with quoted parameter values."""
    name = ""
    params: dict[str, str] = {}
    i = 0
    field = []
    key = None
    in_quotes = False
    while i < len(line):
        c = line[i]
        if in_quotes:
            if c == '"':
                in_quotes = False
            else:
                field.append(c)
        elif c == '"':
            in_quotes = True
        elif c == ";" or c == ":":
            token = "".join(field)
            field = []
            if key is None and not name:
                name = token.upper()
            elif key is not None:
                params[key.upper()] = token
                key = None
            else:
                raise ValueError(f"ics: malformed content line {line!r}")
            if c == ":":
                return name, params, line[i + 1 :]
        elif c == "=" and name and key is None:
            key = "".join(field)
            field = []
        else:
            field.append(c)
        i += 1
    raise ValueError(f"ics: content line without ':' — {line!r}")


def _unescape(v: str) -> str:
    out = []
    i = 0
    while i < len(v):
        c = v[i]
        if c == "\\":
            i += 1
            if i >= len(v):
                raise ValueError("ics: value ends in a bare backslash")
            e = v[i]
            if e in "nN":
                out.append("\n")
            elif e in ",;\\":
                out.append(e)
            else:
                raise ValueError(f"ics: unknown escape \\{e} — quarantine")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def parse_ics(text: str) -> dict:
    """-> {prodid, events: [{uid, summary, dtstart, dtend, location,
    has_rrule, organizer_domain}]}. Unbalanced/foreign BEGIN-END
    structure refuses."""
    lines = _unfold(text)
    if not lines or lines[0].upper() != "BEGIN:VCALENDAR":
        raise ValueError("ics: missing BEGIN:VCALENDAR — quarantine")
    prodid = ""
    events: list[dict] = []
    cur: dict | None = None
    depth = ["VCALENDAR"]
    for line in lines[1:]:
        name, params, value = _split_content_line(line)
        if name == "BEGIN":
            depth.append(value.upper())
            if value.upper() == "VEVENT":
                if cur is not None:
                    raise ValueError("ics: nested VEVENT — quarantine")
                cur = {
                    "uid": "", "summary": "", "dtstart": "", "dtend": "",
                    "location": "", "has_rrule": False,
                    "organizer_domain": "",
                }
            continue
        if name == "END":
            if not depth or depth[-1] != value.upper():
                raise ValueError(
                    f"ics: unbalanced END:{value} — quarantine"
                )
            depth.pop()
            if value.upper() == "VEVENT":
                events.append(cur)  # type: ignore[arg-type]
                cur = None
            continue
        if cur is None:
            if name == "PRODID":
                prodid = value
            continue
        if name == "UID":
            cur["uid"] = value
        elif name == "SUMMARY":
            cur["summary"] = _unescape(value)
        elif name == "DTSTART":
            cur["dtstart"] = value
        elif name == "DTEND":
            cur["dtend"] = value
        elif name == "LOCATION":
            cur["location"] = _unescape(value)
        elif name == "RRULE":
            cur["has_rrule"] = True
        elif name == "ORGANIZER":
            addr = value
            if addr.lower().startswith("mailto:"):
                addr = addr[7:]
            cur["organizer_domain"] = addr.rpartition("@")[2]
    if depth or cur is not None:
        raise ValueError("ics: unclosed BEGIN block — quarantine")
    if lines[-1].upper() != "END:VCALENDAR":
        raise ValueError("ics: missing END:VCALENDAR — quarantine")
    return {"prodid": prodid, "events": events}


def _escape(v: str) -> str:
    return (
        v.replace("\\", "\\\\").replace(",", "\\,").replace(";", "\\;")
        .replace("\n", "\\n")
    )


def _fold(line: str) -> str:
    """RFC 5545 §3.1: fold at 75 octets with a leading space."""
    out = []
    raw = line.encode("utf-8")
    while len(raw) > 75:
        cut = 75
        while cut > 1 and (raw[cut] & 0xC0) == 0x80:  # don't split UTF-8
            cut -= 1
        out.append(raw[:cut].decode("utf-8"))
        raw = b" " + raw[cut:]
    out.append(raw.decode("utf-8"))
    return "\r\n".join(out)


def encode_ics(events: list[dict], prodid: str = "-//spark-graft//EN") -> str:
    lines = ["BEGIN:VCALENDAR", "VERSION:2.0", f"PRODID:{prodid}"]
    for ev in events:
        lines.append("BEGIN:VEVENT")
        lines.append(f"UID:{ev['uid']}")
        lines.append(_fold(f"SUMMARY:{_escape(ev['summary'])}"))
        lines.append(f"DTSTART:{ev['dtstart']}")
        if ev.get("dtend"):
            lines.append(f"DTEND:{ev['dtend']}")
        if ev.get("location"):
            lines.append(_fold(f"LOCATION:{_escape(ev['location'])}"))
        if ev.get("rrule"):
            lines.append(f"RRULE:{ev['rrule']}")
        if ev.get("organizer"):
            lines.append(
                f'ORGANIZER;CN="Dr. X":mailto:{ev["organizer"]}'
            )
        lines.append("END:VEVENT")
    lines.append("END:VCALENDAR")
    return "\r\n".join(lines) + "\r\n"


# ----------------------------------------------------------------------
# vCard (RFC 6350) — shares the content-line machinery above; contact
# cards are the PII-densest objects a crawl carries
# ----------------------------------------------------------------------
def parse_vcards(text: str) -> list[dict]:
    """-> one dict per card: {version, has_fn, n_emails, n_phones,
    email_domains (sorted unique), has_photo, has_address, n_props}.
    Addresses/names/numbers themselves never leave the parser — the
    census exists so a curation pass can DROP cards, not mine them.
    Unbalanced BEGIN/END or junk outside cards refuses."""
    cards: list[dict] = []
    cur: dict | None = None
    for line in _unfold(text):
        name, params, value = _split_content_line(line)
        if name == "BEGIN":
            if value.upper() != "VCARD" or cur is not None:
                raise ValueError("vcard: unbalanced BEGIN — quarantine")
            cur = {
                "version": "", "has_fn": False, "n_emails": 0,
                "n_phones": 0, "email_domains": set(), "has_photo": False,
                "has_address": False, "n_props": 0,
            }
            continue
        if name == "END":
            if value.upper() != "VCARD" or cur is None:
                raise ValueError("vcard: unbalanced END — quarantine")
            cur["email_domains"] = sorted(cur["email_domains"])
            cards.append(cur)
            cur = None
            continue
        if cur is None:
            raise ValueError("vcard: content outside a card — quarantine")
        cur["n_props"] += 1
        if name == "VERSION":
            cur["version"] = value
        elif name == "FN":
            cur["has_fn"] = True
        elif name == "EMAIL":
            cur["n_emails"] += 1
            cur["email_domains"].add(value.rpartition("@")[2].lower())
        elif name == "TEL":
            cur["n_phones"] += 1
        elif name == "PHOTO":
            cur["has_photo"] = True
        elif name == "ADR":
            cur["has_address"] = True
    if cur is not None:
        raise ValueError("vcard: unclosed card — quarantine")
    if not cards:
        raise ValueError("vcard: no cards — quarantine")
    return cards


def encode_vcard(
    fn: str,
    emails: list[str],
    phones: int = 0,
    photo: bool = False,
    address: bool = False,
    version: str = "4.0",
) -> str:
    lines = ["BEGIN:VCARD", f"VERSION:{version}", _fold(f"FN:{_escape(fn)}")]
    for e in emails:
        lines.append(f"EMAIL;TYPE=work:{e}")
    for p in range(phones):
        lines.append(f"TEL;TYPE=cell:+1555000{p:04d}")
    if photo:
        lines.append(_fold("PHOTO:data:image/jpeg;base64," + "A" * 120))
    if address:
        lines.append("ADR:;;1 Main St;Town;;12345;US")
    lines.append("END:VCARD")
    return "\r\n".join(lines) + "\r\n"
