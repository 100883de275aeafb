"""WARC codec + reader tests (sources/warc.py): byte-level round trips
for both container forms, CommonCrawl member independence, honest
failure on truncation, and the Spark reader's end-to-end parse."""

import gzip

import pytest

from shared_etl_pipelines_spark.sources.warc import (
    DEMO_WARC_FILES,
    DEMO_WARC_RECORDS,
    decode_warc,
    demo_warc_record,
    encode_warc,
    ensure_demo_warc,
    read_warc,
)

RECS = [
    {
        "type": "response",
        "target_uri": "https://a.example.com/1",
        "date": "2024-05-01T00:00:00Z",
        "record_id": "<urn:t:1>",
        "payload": "hello warc world",
    },
    {
        "type": "response",
        "target_uri": "https://b.example.com/2",
        "date": "2024-05-02T00:00:00Z",
        "record_id": "<urn:t:2>",
        # payload containing CRLFs and a fake header block: the parser
        # must honor Content-Length, not scan for separators
        "payload": "x\r\n\r\nWARC/1.0\r\nnot-a-header: 1\r\n\r\ny",
    },
    {
        "type": "metadata",
        "target_uri": "https://c.example.com/3",
        "date": "2024-05-03T00:00:00Z",
        "record_id": "<urn:t:3>",
        "payload": "",
    },
]


def _check(decoded):
    assert [r["target_uri"] for r in decoded] == [r["target_uri"] for r in RECS]
    assert [r["payload"].decode() for r in decoded] == [r["payload"] for r in RECS]
    assert [r["type"] for r in decoded] == [r["type"] for r in RECS]
    assert [r["content_length"] for r in decoded] == [
        len(r["payload"]) for r in RECS
    ]


def test_warc_plain_round_trip():
    _check(decode_warc(encode_warc(RECS)))


def test_warc_gz_round_trip_and_member_independence():
    blob = encode_warc(RECS, per_record_gzip=True)
    _check(decode_warc(blob))
    # CommonCrawl contract: every record is its own gzip member — there
    # must be one member header per record, and the FIRST member alone
    # must decompress to exactly record 1 (what makes .warc.gz seekable)
    assert blob.count(b"\x1f\x8b\x08") == len(RECS)
    recs = decode_warc(blob[: _first_member_len(blob)])
    assert len(recs) == 1 and recs[0]["target_uri"] == RECS[0]["target_uri"]
    # the concatenated-members stream is also plain valid WARC bytes
    _check(decode_warc(gzip.decompress(blob)))


def _first_member_len(blob: bytes) -> int:
    import zlib

    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    d.decompress(blob)
    return len(blob) - len(d.unused_data)


def test_warc_truncation_and_garbage_raise():
    one = encode_warc([RECS[0]])  # 16-byte payload at the blob tail
    with pytest.raises(ValueError, match="truncated"):
        decode_warc(one[:-12])  # cut mid-payload
    with pytest.raises(ValueError, match="unterminated"):
        decode_warc(encode_warc(RECS)[:-10])  # cut mid-header-block
    with pytest.raises(ValueError, match="expected WARC"):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    bad = encode_warc([{**RECS[0]}]).replace(b"Content-Length", b"X-Length")
    with pytest.raises(ValueError, match="Content-Length"):
        decode_warc(bad)


def test_read_warc_end_to_end(spark):
    root = ensure_demo_warc()
    df = read_warc(spark, root)
    rows = df.collect()
    assert len(rows) == DEMO_WARC_FILES * DEMO_WARC_RECORDS
    by_key = {(r["archive"], r["record_idx"]): r for r in rows}
    # spot-check closed-form fields incl. a record inside the gz archive
    for f, name in [(0, "crawl-00.warc"), (2, "crawl-02.warc.gz")]:
        for r in (0, DEMO_WARC_RECORDS - 1):
            exp = demo_warc_record(f, r)
            got = by_key[(name, r)]
            assert got["target_uri"] == exp["target_uri"]
            assert got["payload"] == exp["payload"]
            assert got["warc_date"] == exp["date"]
    # (binaryFile may pack small files into one partition — per-archive
    # task granularity only materializes with real ~GiB archives, so no
    # partition-count assertion here; full-content parse is pinned above)


def test_read_warc_skip_posture(spark, tmp_path):
    root = ensure_demo_warc()
    import shutil

    work = tmp_path / "crawl"
    work.mkdir()
    for f in range(DEMO_WARC_FILES):
        name = f"crawl-{f:02d}.warc" + (".gz" if f == DEMO_WARC_FILES - 1 else "")
        shutil.copy(f"{root}/{name}", work / name)
    (work / "broken.warc").write_bytes(b"not a warc at all")
    with pytest.raises(Exception, match="undecodable WARC"):
        read_warc(spark, str(work)).count()
    n = read_warc(spark, str(work), on_error="skip").count()
    assert n == DEMO_WARC_FILES * DEMO_WARC_RECORDS


def test_read_warc_ignores_orphaned_temp_files(spark, tmp_path):
    """ADVICE r4 #4: a writer that dies mid-write leaves a *.part temp
    file; a directory load with on_error='fail' must not pick it up."""
    import shutil

    root = ensure_demo_warc()
    work = tmp_path / "crawl"
    work.mkdir()
    for f in range(DEMO_WARC_FILES):
        name = f"crawl-{f:02d}.warc" + (".gz" if f == DEMO_WARC_FILES - 1 else "")
        shutil.copy(f"{root}/{name}", work / name)
    # the exact ADVICE scenario: a predictable "<path>.tmp" torn write,
    # plus the hidden unique-name form ensure_demo_warc now uses
    (work / "crawl-00.warc.tmp").write_bytes(b"torn half-write")
    (work / ".crawl-01.warc.abc123.part").write_bytes(b"torn half-write")
    n = read_warc(spark, str(work)).count()  # on_error='fail'
    assert n == DEMO_WARC_FILES * DEMO_WARC_RECORDS


def test_crawl_curation_pipeline_matches_registry(spark):
    """The YAML crawl-curation pipeline must reproduce the registry
    query's funnel exactly (same stages, same counts)."""
    import os

    from shared_etl_pipelines_spark.plans import PipelineRunner
    from shared_etl_pipelines_spark.queries_llm import q_warc_curation_funnel

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "shared_etl_pipelines_spark", "plans", "examples", "crawl_curation.yml",
    )
    runner = PipelineRunner(spark)
    result = runner.run(path, var_overrides={"crawl_dir": ensure_demo_warc()})
    got = {(r["stage"], r["n"]) for r in result.outputs["result"]["df"].collect()}
    want = {
        (r["stage"], r["n"])
        for r in q_warc_curation_funnel(spark, "unused").collect()
    }
    assert got == want == {("parsed", 120), ("quality", 90), ("deduped", 45)}
