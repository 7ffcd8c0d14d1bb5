"""Document-level tests: ported find_startxref test
(document.rs:888-898) and fixture-corpus end-to-end pins."""

import pytest

from fixtures.gen import build_pdf_corpus
from pdf_parser_spark.engine import Document, pdf_to_text
from pdf_parser_spark.engine.document import find_startxref
from pdf_parser_spark.engine.errors import PdfError


@pytest.fixture(scope="module")
def corpus():
    return build_pdf_corpus()


def test_find_startxref():
    data = b"%PDF-1.4\n%%EOF\nstartxref\n1234\n%%EOF"
    pos = find_startxref(data)
    assert data[pos:].startswith(b"startxref")


def test_min_uncompressed(corpus):
    assert pdf_to_text(corpus["min-uncompressed"]) == "Hello World\n"


def test_multipage_nested_counts_leaves_not_count_field(corpus):
    doc = Document.parse(corpus["multipage-nested"])
    assert doc.page_count() == 3  # /Count lies (says 99 and 1)
    text = pdf_to_text(corpus["multipage-nested"])
    assert text.index("Page one") < text.index("Page two") < text.index("Page three")


def test_contents_array_newline_join(corpus):
    # split mid-token across two streams; the injected '\n' makes it whole
    assert pdf_to_text(corpus["contents-array"]) == "Joined across streams\n"


def test_incremental_prev_classic_overwrite_quirk(corpus):
    # the reference's classic-xref walk inserts unconditionally while
    # walking newest→oldest (document.rs:239), so the ORIGINAL object
    # body wins over the incremental update — pinned as-is
    assert pdf_to_text(corpus["incremental-prev"]) == "Original content\n"


def test_xrefstream_objstm(corpus):
    doc = Document.parse(corpus["xrefstream-objstm"])
    assert doc.page_count() == 1
    assert pdf_to_text(corpus["xrefstream-objstm"]) == "Object stream page\n"


def test_length_indirect_endstream_scan(corpus):
    assert pdf_to_text(corpus["length-indirect"]) == "Indirect length stream\n"


def test_winansi_decoding(corpus):
    assert pdf_to_text(corpus["winansi"]) == "“Quoted” — caf\xe9\n"


def test_macroman_decoding(corpus):
    assert pdf_to_text(corpus["macroman"]) == "caf\xe9 • dash–here\n"


def test_type0_tounicode(corpus):
    assert pdf_to_text(corpus["type0-tounicode"]) == "Hellmn!?\n"


def test_filter_cases(corpus):
    assert "FlateDecode" in pdf_to_text(corpus["flate-stream"])
    assert pdf_to_text(corpus["asciihex-stream"]) == "Hex encoded stream\n"
    assert pdf_to_text(corpus["filter-chain"]) == "Chained filters content\n"


def test_malformed_raise_engine_level(corpus):
    for case in ("malformed-eof", "malformed-xref", "malformed-filter"):
        with pytest.raises(PdfError):
            pdf_to_text(corpus[case])
    with pytest.raises(PdfError):
        pdf_to_text(corpus["malformed-header"])


def test_heavy_tail_parses(corpus):
    doc = Document.parse(corpus["heavy-tail"])
    assert doc.page_count() == 60


def test_simple_text_extractor_fixed_tolerance(corpus):
    doc = Document.parse(corpus["table-page"])
    txt = doc.extract_page_text_string(0)
    assert txt.splitlines()[0] == "Date Description Amount Balance"


def test_xref_entry_bounds_match_reference_types():
    """Entry fields are usize/u16 in the reference: generation 99999
    (> u16::MAX) or a negative offset must make the document error,
    not extract."""
    from fixtures.gen import case_min_uncompressed
    from pdf_parser_spark.engine import extract_document

    base = case_min_uncompressed()
    bad_gen = base.replace(b" 00000 n \n", b" 99999 n \n", 1)
    assert bad_gen != base
    assert extract_document(bad_gen)["error_kind"] is not None

    # rewrite the first entry's 10-digit offset as negative
    import re

    m = re.search(rb"\n(\d{10}) 00000 n \n", base)
    assert m
    neg = base[: m.start(1)] + b"-000000017" + base[m.end(1):]
    assert extract_document(neg)["error_kind"] is not None


def test_negative_startxref_is_invalid():
    from fixtures.gen import case_min_uncompressed
    from pdf_parser_spark.engine import extract_document

    import re

    base = case_min_uncompressed()
    doc = re.sub(rb"startxref\n\d+\n", b"startxref\n-10\n", base)
    assert doc != base
    r = extract_document(doc)
    assert r["error_kind"] is not None


def test_negative_page_index_errors():
    import pytest

    from fixtures.gen import case_multipage_nested
    from pdf_parser_spark.engine.document import Document
    from pdf_parser_spark.engine.errors import InvalidStructure

    d = Document.parse(case_multipage_nested())
    with pytest.raises(InvalidStructure):
        d.get_page(-1)
