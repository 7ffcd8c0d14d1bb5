"""Ported reference object-parser tests (parser/object.rs:257-318)."""

from pdf_parser_spark.engine.objects import NULL, Name, Ref, Stream
from pdf_parser_spark.engine.parser import Parser


def test_parse_primitives():
    p = Parser(b"null true false 42 3.14")
    assert p.parse_object() is NULL
    assert p.parse_object() is True
    assert p.parse_object() is False
    assert p.parse_object() == 42
    assert p.parse_object() == 3.14


def test_parse_reference():
    assert Parser(b"5 0 R").parse_object() == Ref(5, 0)


def test_parse_array():
    assert Parser(b"[1 2 3]").parse_object() == [1, 2, 3]


def test_parse_dict():
    d = Parser(b"<< /Type /Catalog /Version 1 >>").parse_object()
    assert d["Type"] == Name("Catalog")
    assert d["Version"] == 1


def test_parse_nested():
    d = Parser(b"<< /Kids [1 0 R 2 0 R] >>").parse_object()
    assert d["Kids"] == [Ref(1, 0), Ref(2, 0)]


# -- stream handling (object.rs:187-254) -----------------------------------


def test_stream_exact_length():
    obj = Parser(b"<< /Length 5 >>\nstream\nhello\nendstream").parse_object()
    assert isinstance(obj, Stream)
    assert obj.data == b"hello"


def test_stream_indirect_length_scans_endstream():
    # /Length as a ref falls back to scanning; payload includes the
    # trailing newline up to the marker (object.rs:236-254)
    obj = Parser(b"<< /Length 9 0 R >>\nstream\nhello\nendstream trailer-pad").parse_object()
    assert isinstance(obj, Stream)
    assert obj.data == b"hello\n"


def test_int_vs_ref_lookahead():
    p = Parser(b"[1 2] 3")
    assert p.parse_object() == [1, 2]
    assert p.parse_object() == 3


def test_two_ints_not_a_ref():
    p = Parser(b"10 20 30")
    assert p.parse_object() == 10
    assert p.parse_object() == 20
    assert p.parse_object() == 30


# -- fast-path fallback edges (the combined dict-entry / obj-header
#    regexes must agree with the token path on every off-pattern shape)


def test_ref_array_fast_path_shapes():
    # clean all-ref array (the /Kids shape) — fast-pathed
    assert Parser(b"<< /Kids [3 0 R 5 0 R 7 0 R] >>").parse_object() == {
        "Kids": [Ref(3, 0), Ref(5, 0), Ref(7, 0)]
    }
    # comments between tokens: off the fast pattern, token path result
    assert Parser(b"<< /Kids [3 0 %c\n R] >>").parse_object() == {
        "Kids": [Ref(3, 0)]
    }
    # a real where the gen must be an int: NOT a ref — the stray R is
    # an error on the token path (reference: parse_object has no R
    # arm), and the fast path must fall back to that same error, not
    # silently accept the shape
    import pytest

    from pdf_parser_spark.engine.errors import ParseError

    with pytest.raises(ParseError):
        Parser(b"<< /A [1 0.5 R] /B 2 >>").parse_object()
    # mixed array (name inside) falls back and still parses
    v = Parser(b"<< /A [1 0 R /N 2] >>").parse_object()
    assert v["A"] == [Ref(1, 0), Name("N"), 2]
    # empty array stays the numeric-array fast path
    assert Parser(b"<< /A [] >>").parse_object() == {"A": []}
    # 'R2' is the R keyword followed by int 2 (lexer keyword rule):
    # [1 0 R2] therefore holds Ref(1,0) then 2 on the token path; the
    # fast path must agree (guard only excludes alpha after R)
    assert Parser(b"<< /A [1 0 R2] >>").parse_object() == {
        "A": [Ref(1, 0), 2]
    }


def test_obj_header_fast_path_agrees_with_token_path():
    from pdf_parser_spark.engine.document import _OBJ_HDR_RE

    # canonical header
    m = _OBJ_HDR_RE.match(b"12 0 obj << /A 1 >>")
    assert m and m.group(1) == b"12"
    # comments inside the header are consumed like lexer whitespace
    m = _OBJ_HDR_RE.match(b"12 %x\n 0 obj null")
    assert m and m.group(1) == b"12"
    # 'obj2' is keyword obj + int 2 under the lexer's alpha-run rule,
    # so the fast path may consume the header; 'objx' is the unknown
    # keyword 'objx' and must NOT match
    assert _OBJ_HDR_RE.match(b"12 0 obj2") is not None
    assert _OBJ_HDR_RE.match(b"12 0 objx null") is None
    # a real in either slot is not a header
    assert _OBJ_HDR_RE.match(b"12.5 0 obj") is None
    assert _OBJ_HDR_RE.match(b"12 0.5 obj") is None


def test_dict_fast_path_atomic_names():
    """Non-atomic name groups once let backtracking split a name to
    satisfy the (?!#) guard ('/My#20Font' half-matched as vn='M') or
    peel digits into a fake value ('/K1.5' as {'K1.': 5})."""
    import pytest

    from pdf_parser_spark.engine.errors import ParseError

    assert Parser(b"<< /F /My#20Font >>").parse_object() == {
        "F": Name("My Font")
    }
    assert Parser(b"<< /Type /Font /BaseFont /Times#2DRoman >>").parse_object() == {
        "Type": Name("Font"),
        "BaseFont": Name("Times-Roman"),
    }
    with pytest.raises(ParseError):
        Parser(b"<< /K1.5 >>").parse_object()
    with pytest.raises(ParseError):
        Parser(b"<< /K0 65537 R >>").parse_object()


def test_numeric_array_fast_path_ignores_comment_digits():
    v = Parser(b"<< /Widths [1 %c 2\n3] >>").parse_object()
    assert v == {"Widths": [1, 3]}


def test_i64_overflow_matches_reference():
    """Integers >= 2^63 are a parse ERROR in the reference (i64);
    Python's unbounded int() must reject the same range everywhere —
    lexer, dict fast path, ref fast paths."""
    import pytest

    from pdf_parser_spark.engine.errors import ParseError

    big = b"9223372036854775808"  # 2^63
    with pytest.raises(ParseError, match="Invalid integer"):
        Parser(big).parse_object()
    with pytest.raises(ParseError, match="Invalid integer"):
        Parser(b"<< /N " + big + b" >>").parse_object()
    with pytest.raises(ParseError, match="Invalid integer"):
        Parser(b"<< /R 1 " + big + b" R >>").parse_object()
    with pytest.raises(ParseError, match="Invalid integer"):
        Parser(b"<< /A [" + big + b"] >>").parse_object()
    # i64-max itself is fine
    assert Parser(b"9223372036854775807").parse_object() == 2**63 - 1
