"""Ported reference lexer tests (parser/lexer.rs:368-426) plus edge
cases for the escape/octal/hex rules."""

import pytest

from pdf_parser_spark.engine.errors import ParseError
from pdf_parser_spark.engine.lexer import Lexer


def toks(data: bytes):
    lx = Lexer(data)
    out = []
    while True:
        t = lx.next_token()
        if t is None:
            return out
        out.append(t)


def test_simple_tokens():
    assert toks(b"42 3.14 true null") == [
        ("int", 42),
        ("real", 3.14),
        ("bool", True),
        ("null", None),
    ]


def test_string_with_escapes():
    assert toks(b"(Hello\\nWorld)") == [("str", b"Hello\nWorld")]


def test_nested_parens():
    assert toks(b"(a(b)c)") == [("str", b"a(b)c")]


def test_hex_string():
    assert toks(b"<48656C6C6F>") == [("hexstr", b"Hello")]


def test_dictionary():
    assert toks(b"<< /Type /Catalog >>") == [
        ("<<", None),
        ("name", "Type"),
        ("name", "Catalog"),
        (">>", None),
    ]


def test_name_with_hex_escape():
    assert toks(b"/Font#20Name") == [("name", "Font Name")]


# -- additional pins on cited reference rules ------------------------------


def test_octal_escapes():
    # 1-3 digit octal (lexer.rs:253-264)
    assert toks(b"(\\101\\41\\7)") == [("str", b"A!\x07")]


def test_line_continuation():
    assert toks(b"(one\\\r\ntwo)") == [("str", b"onetwo")]
    assert toks(b"(one\\\ntwo)") == [("str", b"onetwo")]


def test_hex_string_odd_pad_and_whitespace():
    # odd nibble padded with 0; whitespace tolerated (lexer.rs:286-325)
    assert toks(b"<48 65 6C 6C 6F 4>") == [("hexstr", b"Hello@")]


def test_comment_skipping():
    assert toks(b"42 % comment here\n 43") == [("int", 42), ("int", 43)]


def test_number_with_sign_and_decimal():
    assert toks(b"+1.5 -2 .25") == [("real", 1.5), ("int", -2), ("real", 0.25)]


def test_unknown_keyword_errors():
    with pytest.raises(ParseError):
        toks(b"bogus")


def test_unexpected_byte_errors():
    with pytest.raises(ParseError):
        toks(b"\x80")
