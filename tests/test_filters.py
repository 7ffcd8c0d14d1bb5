"""Ported decode tests (decode/mod.rs:85-110, decode/flate.rs:18-38)."""

import zlib

import pytest

from pdf_parser_spark.engine.errors import ParseError, UnsupportedFilter
from pdf_parser_spark.engine.filters import ascii_hex_decode, decode_stream, flate_decode
from pdf_parser_spark.engine.objects import Name


def test_no_filter():
    assert decode_stream({}, b"raw data") == b"raw data"


def test_ascii_hex_decode():
    assert ascii_hex_decode(b"48656C6C6F>") == b"Hello"


def test_ascii_hex_with_whitespace():
    assert ascii_hex_decode(b"48 65 6C 6C 6F>") == b"Hello"


def test_flate_round_trip():
    original = b"Hello, PDF World! This is a test of FlateDecode."
    assert flate_decode(zlib.compress(original)) == original


def test_ascii_hex_odd_pad():
    # trailing odd nibble padded with '0' (mod.rs:64)
    assert ascii_hex_decode(b"484") == b"H@"


def test_ascii_hex_invalid_char():
    with pytest.raises(ParseError):
        ascii_hex_decode(b"4X>")


def test_filter_chain_order():
    payload = zlib.compress(b"secret").hex().encode()
    d = {"Filter": [Name("ASCIIHexDecode"), Name("FlateDecode")]}
    assert decode_stream(d, payload + b">") == b"secret"


def test_unsupported_filter():
    with pytest.raises(UnsupportedFilter):
        decode_stream({"Filter": Name("LZWDecode")}, b"x")
