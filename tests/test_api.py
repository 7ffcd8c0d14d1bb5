"""extract_document contract: errors as values, span offsets, format
dispatch, HTML path."""

import pytest

from fixtures.gen import build_html_corpus, build_pdf_corpus
from pdf_parser_spark.engine import extract_document, pdf_to_text
from pdf_parser_spark.engine.api import (
    pdf_to_aligned_text,
    pdf_to_csv,
    pdf_to_markdown,
    pdf_to_raw_spans,
    pdf_to_tsv,
)


@pytest.fixture(scope="module")
def corpus():
    return build_pdf_corpus()


def test_never_raises_on_any_fixture(corpus):
    for cid, data in corpus.items():
        r = extract_document(data)
        assert isinstance(r, dict), cid
        if cid.startswith("malformed-") and cid != "malformed-header":
            assert r["error"] is not None, cid
        elif cid != "malformed-header":
            assert r["error"] is None, (cid, r["error"])


def test_empty_and_none():
    assert extract_document(b"")["error_kind"] == "empty"
    assert extract_document(None)["error_kind"] == "empty"


def test_text_matches_pdf_to_text_exactly(corpus):
    # the span-tracking renderer must be byte-identical to pdf_to_text
    for cid, data in corpus.items():
        if cid.startswith("malformed-"):
            continue
        r = extract_document(data)
        assert r["text"] == pdf_to_text(data), cid


def test_span_offsets_slice_text(corpus):
    r = extract_document(corpus["headings-page"])
    kinds = [k for (_, _, k) in r["spans"]]
    assert "heading1" in kinds and "paragraph" in kinds
    for start, end, kind in r["spans"]:
        assert 0 <= start <= end <= len(r["text"])
        assert r["text"][start:end].strip() != ""


def test_table_span_kind(corpus):
    r = extract_document(corpus["table-page"])
    assert any(k == "table" for (_, _, k) in r["spans"])


def test_format_dispatch(corpus):
    data = corpus["table-page"]
    assert extract_document(data, fmt="md")["text"] == pdf_to_markdown(data)
    assert extract_document(data, fmt="csv")["text"] == pdf_to_csv(data)
    assert extract_document(data, fmt="tsv")["text"] == pdf_to_tsv(data)
    assert extract_document(data, fmt="text")["text"] == pdf_to_aligned_text(data)
    assert extract_document(data, fmt="raw")["text"] == pdf_to_raw_spans(data)


def test_raw_format_shape(corpus):
    raw = pdf_to_raw_spans(corpus["min-uncompressed"])
    assert raw == "[100.0, 700.0] (12pt): Hello World\n"


def test_html_cases():
    for cid, data in build_html_corpus().items():
        r = extract_document(data)
        assert r["doc_type"] == "html"
        assert r["error"] is None, (cid, r["error"])
        assert r["text"], cid


def test_html_boilerplate_removed():
    htmls = build_html_corpus()
    r = extract_document(htmls["article-simple"])
    assert "Home" not in r["text"]
    assert "Copyright" not in r["text"]
    assert "Understanding Distributed Extraction" in r["text"]
    r2 = extract_document(htmls["link-dense"])
    assert "Popular post" not in r2["text"]
    assert "only real content" in r2["text"]


def test_extract_all_formats_matches_per_format_functions():
    """Single-parse multi-format export must be byte-identical to the
    lib.rs-mirror per-format functions on every fixture."""
    from fixtures.gen import build_pdf_corpus
    from pdf_parser_spark.engine import api
    from pdf_parser_spark.engine.errors import PdfError

    fns = {
        "txt": api.pdf_to_text, "md": api.pdf_to_markdown,
        "csv": api.pdf_to_csv, "tsv": api.pdf_to_tsv,
        "text": api.pdf_to_aligned_text, "raw": api.pdf_to_raw_spans,
        "simple": api.pdf_to_simple_text,
    }
    n = 0
    for cid, data in build_pdf_corpus().items():
        try:
            all_f = api.extract_all_formats(data)
        except PdfError:
            all_f = None
        for fmt, fn in fns.items():
            try:
                expect = fn(data)
            except PdfError:
                expect = None
            got = None if all_f is None else all_f[fmt]
            assert got == expect, (cid, fmt)
            n += 1
    assert n >= 7 * 25


def test_unknown_format_renders_csv_like_cli_wildcard():
    """The reference CLI's wildcard match arm falls back to CSV
    (main.rs:141) — and extract_document must produce a row, never a
    KeyError that kills the executor task."""
    from fixtures.gen import case_table_page
    from pdf_parser_spark.engine import extract_document
    from pdf_parser_spark.engine.api import pdf_to_csv

    data = case_table_page()
    r = extract_document(data, fmt="bogus")
    assert r["error_kind"] is None
    assert r["text"] == pdf_to_csv(data)
    r2 = extract_document(data, fmt="bogus", page=1)
    assert r2["text"] == pdf_to_csv(data)
