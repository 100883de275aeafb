"""PDF text extraction (sources/pdf.py): object grammar, xref chains
(incremental updates), Flate streams, text operators, escapes, loud
refusal of encrypted / xref-stream / unknown-filter files, and the
Spark-side page-row operator."""

import re

import pytest

from shared_etl_pipelines_spark.sources.pdf import (
    _extract_text_ops,
    encode_pdf,
    extract_pdf_text,
    is_pdf,
    parse_pdf_pages,
)


def test_round_trip_multipage_all_show_operators():
    pages = [
        ["first line", "with (parens) \\ backslash", "tail"],
        ["page2 only line"],
        ["p3 l0", "p3 l1", "p3 l2"],
    ]
    blob = encode_pdf(pages)
    assert is_pdf(blob)
    texts = parse_pdf_pages(blob)
    assert texts == ["\n".join(p) for p in pages]
    assert extract_pdf_text(blob) == "\n".join("\n".join(p) for p in pages)
    # uncompressed stream variant parses identically
    assert parse_pdf_pages(encode_pdf(pages, compress=False)) == texts


def test_content_stream_operator_semantics():
    # hex strings, octal escapes, TJ kern numbers, quote operator
    content = (
        b"BT /F1 12 Tf 10 10 Td (A\\101) Tj <4243> Tj "
        b"[(D) -120 (E) 3 (F)] TJ T* (line2) Tj (line3) ' ET"
    )
    assert _extract_text_ops(content) == "AABCDEF\nline2\nline3"
    # text outside BT/ET is ignored
    assert _extract_text_ops(b"(ignored) Tj BT (x) Tj ET") == "x"


def test_incremental_update_prev_chain_newest_wins():
    pages = [["hello", "world"]]
    base = encode_pdf(pages)
    m = list(re.finditer(rb"startxref\s+(\d+)", base))[-1]
    old_xref = int(m.group(1))
    font_num = 3 + 2 * len(pages)
    new_obj_off = len(base) + 1
    update = (
        f"\n{font_num} 0 obj\n"
        "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
    ).encode()
    xref2_off = len(base) + len(update)
    update += (
        f"xref\n{font_num} 1\n{new_obj_off:010d} 00000 n \n"
        f"trailer\n<< /Size {font_num + 1} /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{xref2_off}\n%%EOF"
    ).encode()
    blob = base + update
    # chain resolves: text unchanged, and the newest font object is the
    # one the xref now points at (setdefault keeps newest-first)
    assert parse_pdf_pages(blob) == ["hello\nworld"]


def test_refusals_are_loud_and_named():
    blob = encode_pdf([["x"]])
    # encrypted
    enc = blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(ValueError, match="encrypted"):
        parse_pdf_pages(enc)
    # xref stream (PDF 1.5): startxref points at an obj, not 'xref'
    xs = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /XRef >>\nendobj\n"
        b"startxref\n9\n%%EOF"
    )
    with pytest.raises(ValueError, match="cross-reference stream"):
        parse_pdf_pages(xs)
    # unknown filter (same-length name keeps xref offsets valid)
    bad = blob.replace(b"/FlateDecode", b"/LZWDecode  ")
    with pytest.raises(ValueError, match="LZWDecode"):
        parse_pdf_pages(bad)
    # truncation
    with pytest.raises(ValueError):
        parse_pdf_pages(blob[:-30])
    with pytest.raises(ValueError, match="PDF"):
        parse_pdf_pages(b"not a pdf at all")


def test_spark_pdf_text_rows_and_quarantine(spark):
    from shared_etl_pipelines_spark.sources.multimodal import (
        pdf_text_rows,
        synthetic_pdf_assets,
    )

    docs = spark.createDataFrame(
        [(d, "y" * (3 + d)) for d in range(1, 16)], "doc_id long, text string"
    )
    rows = pdf_text_rows(synthetic_pdf_assets(docs)).collect()
    quarantined = {r["doc_id"] for r in rows if not r["is_extracted"]}
    assert quarantined == {7, 14}
    ok = [r for r in rows if r["is_extracted"]]
    # closed-form check for one page
    d = 2
    n = 3 + d
    r = next(r for r in ok if r["doc_id"] == d and r["page_idx"] == 0)
    want = "\n".join(
        f"doc-{d}-p0-l{j}-" + "w" * ((n + j) % 5) for j in range((n + 0) % 3 + 1)
    )
    assert r["text"] == want
    assert r["n_chars"] == len(want)
    assert r["n_lines"] == want.count("\n") + 1
    # page fan-out matches n%3+1 for every extracted doc
    by_doc: dict = {}
    for r in ok:
        by_doc.setdefault(r["doc_id"], set()).add(r["page_idx"])
    for d, pages in by_doc.items():
        n = 3 + d
        assert pages == set(range(n % 3 + 1))


def test_freed_objects_are_not_resurrected():
    """Review r8 #5: an object FREED by the newest incremental update
    must not resolve to an older section's offset via /Prev."""
    import re

    pages = [["kept page"], ["doomed page"]]
    base = encode_pdf(pages)
    m = list(re.finditer(rb"startxref\s+(\d+)", base))[-1]
    old_xref = int(m.group(1))
    # free object 5 (page 2's page object: 3 + 2*1) in an update
    update = (
        f"\nxref\n5 1\n0000000000 00001 f \n"
        f"trailer\n<< /Size 8 /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{len(base) + 1}\n%%EOF"
    ).encode()
    blob = base + update
    with pytest.raises(ValueError, match="freed"):
        parse_pdf_pages(blob)


def test_bare_trailing_backslash_raises_valueerror():
    """Review r8 #7: b'' is a substring of everything — a literal
    string ending in a bare backslash must raise the documented
    ValueError (the quarantine signal), not KeyError."""
    from shared_etl_pipelines_spark.sources.pdf import _Lexer

    with pytest.raises(ValueError, match="backslash"):
        _Lexer(b"(abc\\", 0)._read_literal_string()


def _append_update(base: bytes, num: int, body: str) -> bytes:
    """Incremental update redefining object ``num`` with ``body``."""
    m = list(re.finditer(rb"startxref\s+(\d+)", base))[-1]
    old_xref = int(m.group(1))
    new_obj_off = len(base) + 1
    update = f"\n{num} 0 obj\n{body}\nendobj\n".encode()
    xref2_off = len(base) + len(update)
    update += (
        f"xref\n{num} 1\n{new_obj_off:010d} 00000 n \n"
        f"trailer\n<< /Size 99 /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{xref2_off}\n%%EOF"
    ).encode()
    return base + update


def test_circular_references_quarantine_not_hang():
    base = encode_pdf([["hello"]])
    # self-referential indirect object: resolve() must raise, not spin
    self_ref = _append_update(base, 2, "2 0 R")
    with pytest.raises(ValueError, match="circular indirect"):
        parse_pdf_pages(self_ref)
    # mutual cycle through two objects
    mutual = _append_update(_append_update(base, 2, "7 0 R"), 7, "2 0 R")
    with pytest.raises(ValueError, match="circular indirect"):
        parse_pdf_pages(mutual)
    # page-tree Kids cycle: Pages node listing itself as a kid
    kids_cycle = _append_update(
        base, 2, "<< /Type /Pages /Kids [2 0 R] /Count 1 >>"
    )
    with pytest.raises(ValueError, match="circular page-tree"):
        parse_pdf_pages(kids_cycle)


def test_document_info_roundtrip_and_refusals():
    """Trailer /Info dictionary (r9-continued): provenance metadata
    through the real xref walk; absent /Info is a visible false."""
    import pytest

    from shared_etl_pipelines_spark.sources import pdf

    blob = pdf.encode_pdf(
        [["hello world"], ["page two"]],
        info={"Title": "T1", "Author": "A (x)", "Producer": "p",
              "CreationDate": "D:20260101120000Z"},
    )
    o = pdf.pdf_document_info(blob)
    assert o["has_info"] and o["n_pages"] == 2
    assert o["title"] == "T1" and o["author"] == "A (x)"  # escapes survive
    assert o["creation_date"] == "D:20260101120000Z"
    assert o["mod_date"] == ""
    # the info object does not perturb text extraction
    assert "hello world" in pdf.extract_pdf_text(blob)
    plain = pdf.pdf_document_info(pdf.encode_pdf([["x"]]))
    assert not plain["has_info"] and plain["n_pages"] == 1
    with pytest.raises(ValueError):
        pdf.pdf_document_info(blob[:-20])
