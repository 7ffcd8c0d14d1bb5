"""pdf_image_stats: the real PDF build → xref walk → XObject
inventory → SOFn round-trip, plus mismatch and malformed-document
behavior (parity vs the analytic oracle is in test_ops_parity)."""

import pytest

from pdf_parser_spark.engine.errors import PdfError
from pdf_parser_spark.ops.pdfimages import (
    _doc_params,
    _doc_pdf,
    _jpeg_bytes,
    pdf_image_inventory,
)


def test_inventory_matches_params_for_synthesized_doc():
    payload = b"some document text for images"
    params = _doc_params(payload)
    inv = pdf_image_inventory(_doc_pdf(payload))
    assert len(inv) == len(params)
    for (is_dct, w, h), row in zip(params, inv):
        assert row["width"] == w and row["height"] == h
        assert row["verified"] is True
        if is_dct:
            assert row["filter"] == "DCTDecode"
            assert (row["parsed_w"], row["parsed_h"]) == (w, h)
        else:
            assert row["filter"] == "FlateDecode"
            assert row["parsed_w"] is None


def test_dct_dims_mismatch_flags_unverified():
    """A lying /Width is caught by the SOFn walk — the whole point of
    carrying both dims."""
    from fixtures.gen import PdfBuilder

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 4 0 R /Resources << /XObject << /Im1 5 0 R >> "
             b">> >>")
    b.add_stream(4, b"", b"q 10 0 0 10 0 0 cm /Im1 Do Q")
    b.add_stream(
        5,
        b"/Type /XObject /Subtype /Image /Width 999 /Height 50",
        _jpeg_bytes(100, 50),
        b"/DCTDecode",
    )
    inv = pdf_image_inventory(b.build())
    assert len(inv) == 1
    assert inv[0]["width"] == 999 and inv[0]["parsed_w"] == 100
    assert inv[0]["verified"] is False


def test_non_image_xobjects_and_pages_without_images_are_skipped():
    from fixtures.gen import PdfBuilder

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 4 0 R /Resources << /XObject << /Fm1 5 0 R >> "
             b">> >>")
    b.add_stream(4, b"", b"BT ET")
    b.add_stream(5, b"/Type /XObject /Subtype /Form /BBox [0 0 1 1]", b"q Q")
    assert pdf_image_inventory(b.build()) == []


def test_malformed_pdf_raises_pdferror_not_task_death():
    with pytest.raises(PdfError):
        pdf_image_inventory(b"not a pdf at all")


def test_params_are_deterministic_and_bounded():
    for payload in (b"", b"a", b"z" * 500):
        params = _doc_params(payload)
        assert params == _doc_params(payload)
        assert 1 <= len(params) <= 3
        for _d, w, h in params:
            assert 16 <= w < 2016 and 16 <= h < 2016
