"""Opt-in extended decode filters (engine/filters.py ``extended=True``):
LZWDecode / ASCII85Decode / RunLengthDecode / PNG predictors — public
PDF 32000-1:2008 §7.4 algorithms the reference errors on
(decode/mod.rs:45-51).

Contract: DEFAULT dispatch must keep erroring on these (byte-identity
with the reference is pinned elsewhere and re-asserted here), while
extended mode must produce text identical to an unencoded twin built
from the same content stream.  Unit-level: codec round-trips including
hypothesis property coverage.
"""

import pytest
from hypothesis import given, settings, strategies as st

from fixtures.gen import (
    _a85_encode,
    _lzw_encode,
    _png_predict,
    _rl_encode,
    build_extended_corpus,
)
from pdf_parser_spark.engine.api import extract_document, pdf_to_text
from pdf_parser_spark.engine.errors import PdfError, UnsupportedFilter
from pdf_parser_spark.engine.filters import (
    apply_predictor,
    ascii85_decode,
    decode_stream,
    lzw_decode,
    run_length_decode,
)
from pdf_parser_spark.engine.objects import Name

CORPUS = build_extended_corpus()


# ---------------------------------------------------------- codec units


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000), st.sampled_from([0, 1]))
def test_lzw_roundtrip(data, early):
    assert lzw_decode(_lzw_encode(data, early), early) == data


def test_lzw_width_boundary():
    # >253 distinct-pair emissions forces the 9->10 bit transition
    data = bytes(range(256)) * 8
    assert lzw_decode(_lzw_encode(data)) == data
    assert lzw_decode(_lzw_encode(data, 0), 0) == data


def test_lzw_rejects_garbage():
    with pytest.raises(PdfError):
        lzw_decode(b"\xff\xff\xff\xff\xff\xff")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_ascii85_roundtrip(data):
    assert ascii85_decode(_a85_encode(data)) == data


def test_ascii85_specials():
    assert ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert ascii85_decode(b"<~z~>") == b"\x00\x00\x00\x00"
    assert ascii85_decode(b" 9jqo^ ~>") == ascii85_decode(b"9jqo^~>")
    with pytest.raises(PdfError):
        ascii85_decode(b"\xff~>")


def test_ascii85_malformed_trailing_group_is_pdferror():
    """A corrupt tail whose 'u'-padded value exceeds 2^32-1 (e.g.
    "uu") must surface as PdfError -> decode_error row, never an
    OverflowError that would kill the Spark task."""
    for tail in (b"uu~>", b"uuu~>", b"uuuu~>", b"s8W-!uu~>"):
        with pytest.raises(PdfError):
            ascii85_decode(tail)
    # boundary: the canonical 2-char tail for 0xff still decodes
    assert ascii85_decode(b"rr~>") == b"\xff"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=800))
def test_runlength_roundtrip(data):
    assert run_length_decode(_rl_encode(data)) == data


def test_runlength_truncated():
    with pytest.raises(PdfError):
        run_length_decode(b"\x05ab")  # literal claims 6 bytes, has 2
    with pytest.raises(PdfError):
        run_length_decode(b"\xfe")  # run with no byte to repeat


@settings(max_examples=150, deadline=None)
@given(
    st.binary(min_size=1, max_size=400),
    st.integers(min_value=1, max_value=40),
)
def test_png_predictor_roundtrip(data, columns):
    parms = {"Predictor": 12, "Columns": columns}
    got = apply_predictor(_png_predict(data, columns), parms)
    # forward transform NUL-pads the last row
    pad = (-len(data)) % columns
    assert got == data + bytes(pad)


def test_tiff_predictor():
    raw = bytes([10, 20, 30, 40, 50, 60])
    enc = bytearray(raw)
    for j in range(len(enc) - 1, 0, -1):  # horizontal differencing
        enc[j] = (enc[j] - enc[j - 1]) & 0xFF
    parms = {"Predictor": 2, "Columns": 6}
    assert apply_predictor(bytes(enc), parms) == raw


# -------------------------------------------------- dispatch semantics


def _stream_dict(filters, parms=None):
    d = {"Filter": filters}
    if parms is not None:
        d["DecodeParms"] = parms
    return d


def test_default_dispatch_still_reference_exact():
    payload = _lzw_encode(b"hello")
    for name in ("LZWDecode", "ASCII85Decode", "RunLengthDecode"):
        with pytest.raises(UnsupportedFilter):
            decode_stream(_stream_dict(Name(name)), payload)


def test_extended_dispatch_chain_and_parms():
    data = b"chained payload " * 20
    blob = _a85_encode(_lzw_encode(data))
    d = _stream_dict([Name("ASCII85Decode"), Name("LZWDecode")])
    assert decode_stream(d, blob, extended=True) == data
    # DecodeParms array aligned to the chain; EarlyChange honored
    blob0 = _a85_encode(_lzw_encode(data, early=0))
    d0 = _stream_dict(
        [Name("ASCII85Decode"), Name("LZWDecode")],
        [{}, {"EarlyChange": 0}],
    )
    assert decode_stream(d0, blob0, extended=True) == data


def test_extended_unknown_filter_still_errors():
    with pytest.raises(UnsupportedFilter):
        decode_stream(_stream_dict(Name("DCTDecode")), b"x", extended=True)


# ------------------------------------------------- document-level e2e


@pytest.mark.parametrize("case_id", sorted(CORPUS))
def test_extended_case_matches_plain_twin(case_id):
    encoded, plain = CORPUS[case_id]
    want = pdf_to_text(plain)
    assert want  # the twin must actually extract text
    got = pdf_to_text(encoded, extended=True)
    assert got.rstrip("\x00") == want or got == want
    # via the row-level API too
    r = extract_document(encoded, extended_filters=True)
    assert r["error"] is None and r["text"].rstrip("\x00") in (want, r["text"])


@pytest.mark.parametrize("case_id", sorted(CORPUS))
def test_extended_case_errors_by_default(case_id):
    """Reference-faithful default: every extended-only construct is a
    row-level error (unsupported filter / unreadable xref), never a
    crash and never silent wrong text."""
    encoded, plain = CORPUS[case_id]
    r = extract_document(encoded)
    want = pdf_to_text(plain)
    if r["error"] is None:
        # a case that happens to parse by default must NOT produce
        # the twin's text from garbage (would mask a dispatch leak)
        assert r["text"] != want
    else:
        assert r["error_kind"] in (
            "unsupported_filter",
            "invalid_structure",
            "decompress",
            "parse",
            # predictored xref: Flate succeeds, the un-unpredicted
            # entry table points objects at garbage offsets
            "object_not_found",
        )


def test_extended_flag_is_noop_on_reference_corpus():
    """On the Flate/AHx-only fixture corpus the extended path must be
    byte-identical to the default path (predictor absent, dispatch
    unchanged) — the guard that the extension cannot perturb the
    byte-identity target when enabled."""
    from fixtures.gen import build_pdf_corpus

    for case_id, pdf in build_pdf_corpus().items():
        base = extract_document(pdf)
        if base["error_kind"] == "unsupported_filter":
            # the one place the modes legitimately diverge: extended
            # ATTEMPTS the filter (malformed-filter: garbage /LZWDecode
            # payload → decompress error instead of unsupported)
            ext = extract_document(pdf, extended_filters=True)
            assert ext["error"] is not None, case_id
            continue
        assert base == extract_document(
            pdf, extended_filters=True
        ), case_id
