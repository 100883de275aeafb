"""WebVTT/SRT caption parsing (sources/captions.py): timing grammar,
multi-line text, NOTE blocks, cue identifiers/settings, CRLF input,
loud refusal of every malformation class."""

import pytest

from shared_etl_pipelines_spark.sources.captions import (
    encode_srt,
    encode_webvtt,
    parse_srt,
    parse_webvtt,
)

CUES = [(500, 2000, "hello"), (2500, 4000, "two\nlines"),
        (4500, 2 * 3600_000 + 1500, "past the hour mark")]


def test_round_trips_and_hours_field():
    for enc, par in ((encode_webvtt, parse_webvtt), (encode_srt, parse_srt)):
        got = par(enc(CUES))
        assert [(s, e, t) for _, s, e, t in got] == CUES
        assert [i for i, _, _, _ in got] == [0, 1, 2]


def test_vtt_optional_pieces():
    # optional hours, cue identifier line, cue settings after the end
    # timestamp, CRLF line endings, NOTE skipped
    v = (
        "WEBVTT\r\n\r\nNOTE a comment\r\nspanning lines\r\n\r\n"
        "my-id\r\n00:01.000 --> 00:02.500 align:start\r\ntext here\r\n"
    )
    assert parse_webvtt(v) == [(0, 1000, 2500, "text here")]


def test_refusals_are_loud():
    with pytest.raises(ValueError, match="WEBVTT signature"):
        parse_webvtt("no-sig\n\n00:00:01.000 --> 00:00:02.000\nx")
    with pytest.raises(ValueError, match="non-positive duration"):
        parse_webvtt("WEBVTT\n\n00:00:02.000 --> 00:00:02.000\nx")
    # '->' instead of '-->': the line no longer parses as a timing
    # line, and the block has no other timing line either
    with pytest.raises(ValueError, match="timing line"):
        parse_webvtt("WEBVTT\n\n00:00:01.000 -> 00:00:02.000\nx")
    # broken arrow ON the timing line of an identified cue
    with pytest.raises(ValueError, match="without '-->'"):
        parse_srt("1\n00:00:01,000 -> 00:00:02,000\nx")
    with pytest.raises(ValueError, match="timing line"):
        parse_webvtt("WEBVTT\n\njust text\nno timing anywhere")
    # SRT: comma decimal required, contiguous indices required
    with pytest.raises(ValueError, match="timestamp"):
        parse_srt("1\n00:00:01.000 --> 00:00:02.000\nx")
    with pytest.raises(ValueError, match="non-contiguous"):
        parse_srt("2\n00:00:01,000 --> 00:00:02,000\nx")
    with pytest.raises(ValueError, match="index line"):
        parse_srt("one\n00:00:01,000 --> 00:00:02,000\nx")
    # minutes field must stay under 60
    with pytest.raises(ValueError, match="timestamp"):
        parse_webvtt("WEBVTT\n\n00:61:01.000 --> 00:61:02.000\nx")


def test_spark_caption_cues_and_quarantine(spark):
    from shared_etl_pipelines_spark.sources.multimodal import (
        caption_cue_rows,
        synthetic_caption_assets,
    )

    docs = spark.createDataFrame(
        [(d, "y" * (3 + d)) for d in range(1, 28)], "doc_id long, text string"
    )
    rows = caption_cue_rows(synthetic_caption_assets(docs)).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        n = 3 + d
        if d % 9 == 0:
            assert len(rs) == 1 and rs[0]["reason"] == "malformed"
            assert rs[0]["cue_idx"] == -1
            continue
        assert len(rs) == n % 4 + 2
        for r in sorted(rs, key=lambda r: r["cue_idx"]):
            i = r["cue_idx"]
            assert r["fmt"] == (
                "vtt" if d % 4 == 0 else "ttml" if d % 4 == 2 else "srt"
            )
            assert r["start_ms"] == d % 1000 + 2000 * i
            assert r["end_ms"] - r["start_ms"] == 1200 + (d % 5) * 100
            want = f"line-{d}-{i}" + (f"\ncont-{i}" if i % 2 else "")
            assert r["text"] == want and r["n_chars"] == len(want)


# ---------------------------------------------------------------------------
# TTML (r9-continued)
# ---------------------------------------------------------------------------
def test_ttml_roundtrip_and_time_expressions():
    from shared_etl_pipelines_spark.sources import captions as c

    cues = [(123, 2500, "hello"), (4000, 6100, "two\nlines & <esc>")]
    out = c.parse_ttml(c.encode_ttml(cues))
    assert out == [
        (0, 123, 2500, "hello"),
        (1, 4000, 6100, "two\nlines & <esc>"),
    ]
    assert c._ttml_ms("1.5s") == 1500
    assert c._ttml_ms("500ms") == 500
    assert c._ttml_ms("2m") == 120_000
    assert c._ttml_ms("1h") == 3_600_000
    assert c._ttml_ms("01:02:03") == 3_723_000
    assert c._ttml_ms("01:02:03.45") == 3_723_450  # frac pads to ms


def test_ttml_dur_and_nested_spans():
    from shared_etl_pipelines_spark.sources import captions as c

    xml = (
        '<tt xmlns="http://www.w3.org/ns/ttml"><body><div>'
        '<p begin="1s" dur="2s">a <span>styled</span> word</p>'
        "</div></body></tt>"
    )
    assert c.parse_ttml(xml) == [(0, 1000, 3000, "a styled word")]


def test_ttml_refusals():
    import pytest

    from shared_etl_pipelines_spark.sources import captions as c

    for bad in ("00:00:01:15", "15f", "3t", "abc"):  # frame/tick metrics
        with pytest.raises(ValueError):
            c._ttml_ms(bad)
    with pytest.raises(ValueError):
        c.parse_ttml("<xhtml><p begin='1s' end='2s'>x</p></xhtml>")
    with pytest.raises(ValueError):
        c.parse_ttml("<tt><body><p end='2s'>no-begin</p></body></tt>")
    with pytest.raises(ValueError):
        c.parse_ttml("<tt><body><p begin='1s'>no-end</p></body></tt>")
    with pytest.raises(ValueError):
        c.parse_ttml("<tt><body><p begin='2s' end='2s'>zero</p></body></tt>")
    with pytest.raises(ValueError):
        c.parse_ttml("<tt><body><p begin='1s' end='2s'>x</p></body>")
