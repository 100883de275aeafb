"""iCalendar parsing (sources/ical.py)."""
import pytest

from shared_etl_pipelines_spark.sources import ical


def _events():
    return [
        dict(uid="ev-1@ex.test", summary="plan, sync; " + "long word " * 15,
             dtstart="20260815T090000Z", dtend="20260815T100000Z",
             location="room A\nfloor 2", rrule="FREQ=WEEKLY;COUNT=4",
             organizer="user3@ex7.test"),
        dict(uid="ev-2@ex.test", summary="ünïcode mötley " * 8,
             dtstart="20260816T090000Z"),
    ]


def test_roundtrip_with_folding_escapes_and_params():
    text = ical.encode_ics(_events())
    assert "\r\n " in text  # folding actually happened
    assert all(len(line.encode()) <= 76 for line in text.split("\r\n"))
    out = ical.parse_ics(text)
    e0, e1 = out["events"]
    assert e0["summary"] == "plan, sync; " + "long word " * 15
    assert e0["location"] == "room A\nfloor 2"
    assert e0["has_rrule"]
    # ORGANIZER had a quoted CN containing nothing special, domain only
    assert e0["organizer_domain"] == "ex7.test"
    assert e1["summary"] == "ünïcode mötley " * 8
    assert e1["organizer_domain"] == "" and not e1["has_rrule"]


def test_fold_never_splits_utf8():
    enc = ical.encode_ics(
        [dict(uid="u", summary="ö" * 100, dtstart="X")]
    )
    for line in enc.split("\r\n"):
        line.encode("utf-8")  # every physical line is valid UTF-8
    assert ical.parse_ics(enc)["events"][0]["summary"] == "ö" * 100


def test_quoted_params_hide_delimiters():
    text = (
        "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nUID:u1\r\n"
        'ORGANIZER;CN="Dr. Who: a;b,c":mailto:x@dom.test\r\n'
        "DTSTART:20260101T000000Z\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n"
    )
    out = ical.parse_ics(text)
    assert out["events"][0]["organizer_domain"] == "dom.test"


def test_refusals():
    text = ical.encode_ics(_events())
    with pytest.raises(ValueError):
        ical.parse_ics(text.replace("END:VCALENDAR\r\n", ""))
    with pytest.raises(ValueError):
        ical.parse_ics(text.replace("END:VEVENT", "END:VTODO", 1))
    with pytest.raises(ValueError):
        ical.parse_ics("X:1\r\n" + text)  # junk before BEGIN
    with pytest.raises(ValueError):
        ical.parse_ics(
            "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:\\q\r\n"
            "END:VEVENT\r\nEND:VCALENDAR\r\n"
        )  # unknown escape
    with pytest.raises(ValueError):
        ical.parse_ics(
            "BEGIN:VCALENDAR\r\nNOCOLONLINE\r\nEND:VCALENDAR\r\n"
        )


# ---------------------------------------------------------------------------
# vCard (RFC 6350) — shares the content-line machinery
# ---------------------------------------------------------------------------
def test_vcard_census_and_pii_discipline():
    text = (
        ical.encode_vcard(
            "Ada L", ["a@ex1.test", "b@EX1.test", "c@ex2.test"],
            phones=2, photo=True, address=True,
        )
        + ical.encode_vcard("Bob", [], version="3.0")
    )
    cards = ical.parse_vcards(text)
    assert len(cards) == 2
    c0, c1 = cards
    assert c0["has_fn"] and c0["n_emails"] == 3 and c0["n_phones"] == 2
    assert c0["email_domains"] == ["ex1.test", "ex2.test"]  # dedup + fold
    assert c0["has_photo"] and c0["has_address"]
    assert c1["version"] == "3.0" and c1["n_props"] == 2
    # the census never exposes addresses/numbers/names
    for c in cards:
        assert "Ada" not in str(sorted(c.items()))


def test_vcard_refusals():
    text = ical.encode_vcard("X", ["x@d.test"])
    with pytest.raises(ValueError):
        ical.parse_vcards(text.replace("END:VCARD\r\n", ""))
    with pytest.raises(ValueError):
        ical.parse_vcards("FN:x\r\n" + text)  # content outside a card
    with pytest.raises(ValueError):
        ical.parse_vcards("BEGIN:VCARD\r\n")
    with pytest.raises(ValueError):
        ical.parse_vcards("")
