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
