"""Ported font-encoding tests (font/encoding.rs:200-239) and CMap
tests (font/cmap.rs:173-215)."""

from pdf_parser_spark.engine.cmap import parse_tounicode_cmap
from pdf_parser_spark.engine.fonts import FontEncoding


def test_win_ansi_basic():
    enc = FontEncoding.win_ansi()
    assert enc.decode_byte(ord("A")) == "A"
    assert enc.decode_byte(ord("Z")) == "Z"
    assert enc.decode_byte(ord(" ")) == " "


def test_win_ansi_special():
    enc = FontEncoding.win_ansi()
    assert enc.decode_byte(0x80) == "€"  # Euro
    assert enc.decode_byte(0x99) == "™"  # TM


def test_cid_decode():
    enc = FontEncoding.from_cid_map({})
    enc.add_cid_mapping(0x0024, "A")
    enc.add_cid_mapping(0x0003, " ")
    assert enc.decode_cid(0x0024) == "A"
    assert enc.decode_cid(0x0003) == " "
    assert enc.decode_cid(0x9999) is None


def test_decode_bytes_cid():
    enc = FontEncoding.from_cid_map({0x0024: "A", 0x0025: "B"})
    assert enc.decode_bytes(bytes([0x00, 0x24, 0x00, 0x25])) == "AB"


def test_cid_miss_falls_back_to_two_bytes():
    # (encoding.rs:176-179)
    enc = FontEncoding.from_cid_map({0x0024: "A"})
    assert enc.decode_bytes(bytes([0x00, 0x41])) == "\x00A"


def test_cid_odd_tail_byte():
    enc = FontEncoding.from_cid_map({0x0024: "A"})
    assert enc.decode_bytes(bytes([0x00, 0x24, 0x42])) == "AB"


def test_mac_roman_quirks():
    # the reference's table uses plain space at 0xCA and ASCII '"' at
    # 0xD2/0xD3 (encoding.rs:115-118) — pinned deliberately
    enc = FontEncoding.mac_roman()
    assert enc.decode_byte(0xCA) == " "
    assert enc.decode_byte(0xD2) == '"'
    assert enc.decode_byte(0x8E) == "é"


# -- CMap ------------------------------------------------------------------


def test_parse_bfchar():
    cmap = b"\nbeginbfchar\n<0003><0020>\n<0024><0041>\nendbfchar\n"
    m = parse_tounicode_cmap(cmap)
    assert m[0x0003] == " "
    assert m[0x0024] == "A"


def test_parse_bfrange():
    cmap = b"\nbeginbfrange\n<0003><0003><0020>\n<0024><0024><0041>\nendbfrange\n"
    m = parse_tounicode_cmap(cmap)
    assert m[0x0003] == " "
    assert m[0x0024] == "A"


def test_parse_bfrange_sequence():
    cmap = b"\nbeginbfrange\n<0024><0026><0041>\nendbfrange\n"
    m = parse_tounicode_cmap(cmap)
    assert m[0x0024] == "A"
    assert m[0x0025] == "B"
    assert m[0x0026] == "C"


def test_parse_bfrange_array_form():
    cmap = b"beginbfrange\n<0060><0061> [<0021> <003F>]\nendbfrange"
    m = parse_tounicode_cmap(cmap)
    assert m[0x0060] == "!"
    assert m[0x0061] == "?"


def test_hex_overflow_becomes_zero():
    # u16 parse overflow → 0 (cmap.rs:170)
    cmap = b"beginbfchar\n<10041><0041>\nendbfchar"
    m = parse_tounicode_cmap(cmap)
    assert m[0] == "A"
