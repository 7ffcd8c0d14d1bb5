"""Charset sniffing cascade (WHATWG HTML §13.2.3.2): BOM beats meta,
meta prescan beats the fallback, declared codecs decode real non-UTF-8
pages correctly, and the function is total on arbitrary bytes."""

import pytest
from hypothesis import given, settings, strategies as st

from pdf_parser_spark.html.charset import (
    PRESCAN_BYTES,
    sniff_decode,
    sniff_encoding,
)
from pdf_parser_spark.html.strip import extract_html


def test_utf8_bom_wins_over_lying_meta():
    data = b"\xef\xbb\xbf<meta charset=windows-1251><p>caf\xc3\xa9</p>"
    codec, how = sniff_encoding(data)
    assert (codec, how) == ("utf-8-sig", "bom")
    text, _ = sniff_decode(data)
    assert "café" in text and "﻿" not in text


def test_utf16_boms():
    for bom, codec in ((b"\xff\xfe", "utf-16-le"), (b"\xfe\xff", "utf-16-be")):
        data = bom + "<p>hi</p>".encode(codec)
        assert sniff_encoding(data)[0] == codec
        text, used = sniff_decode(data)
        assert used == codec and "hi" in text
        assert not text.startswith("﻿")  # BOM stripped


@pytest.mark.parametrize(
    "meta",
    [
        b'<meta charset="windows-1251">',
        b"<meta charset=windows-1251>",
        b"<META CHARSET='WINDOWS-1251'>",
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1251">',
    ],
)
def test_meta_variants_detect_cyrillic(meta):
    body = "<p>Привет мир</p>".encode("windows-1251")
    text, codec = sniff_decode(meta + body)
    assert codec == "windows-1251"
    assert "Привет мир" in text


def test_shift_jis_page_roundtrips():
    page = b'<meta charset="shift_jis"><p>' + "日本語".encode("shift_jis")
    text, codec = sniff_decode(page)
    assert codec == "shift_jis"
    assert "日本語" in text


def test_latin1_label_upgrades_to_1252():
    # 0x92 is a curly apostrophe in windows-1252, UNDEFINED in iso-8859-1
    page = b'<meta charset="iso-8859-1"><p>it\x92s</p>'
    text, codec = sniff_decode(page)
    assert codec == "windows-1252"
    assert "it’s" in text


def test_meta_beyond_prescan_window_is_ignored():
    page = b" " * PRESCAN_BYTES + b'<meta charset="windows-1251">caf\xe9'
    text, codec = sniff_decode(page)
    # undeclared non-UTF-8 bytes -> windows-1252 fallback
    assert codec == "windows-1252"
    assert "café" in text


def test_unknown_label_falls_through():
    page = b'<meta charset="klingon-9"><p>plain ascii</p>'
    assert sniff_decode(page)[1] == "utf-8"


def test_utf16_meta_label_treated_as_utf8():
    page = b'<meta charset="utf-16"><p>ascii body</p>'
    text, codec = sniff_decode(page)
    assert codec == "utf-8" and "ascii body" in text


def test_charset_in_plain_content_attr_is_ignored():
    # charset= inside a non-http-equiv content value is NOT a declaration
    page = (
        b'<meta name="description" content="how to set charset=iso-8859-1">'
        + "<p>café</p>".encode("utf-8")
    )
    text, codec = sniff_decode(page)
    assert codec == "utf-8" and "café" in text


def test_commented_out_meta_is_ignored():
    page = b"<!-- <meta charset=big5> -->" + "<p>café</p>".encode("utf-8")
    text, codec = sniff_decode(page)
    assert codec == "utf-8" and "café" in text


def test_unterminated_comment_swallows_meta():
    page = b"<!-- <meta charset=big5>" + b"<p>ascii</p>"
    assert sniff_decode(page)[1] == "utf-8"


def test_later_meta_wins_when_first_label_unknown():
    page = (
        b'<meta charset="klingon-9"><meta charset="windows-1251">'
        + "<p>Привет</p>".encode("windows-1251")
    )
    text, codec = sniff_decode(page)
    assert codec == "windows-1251" and "Привет" in text


def test_undeclared_utf8_stays_utf8():
    page = "<p>café 日本</p>".encode("utf-8")
    text, codec = sniff_decode(page)
    assert codec == "utf-8" and "café" in text


def test_stripper_sees_decoded_text():
    body = "<html><body><p>" + "Привет мир слово " * 30 + "</p></body></html>"
    page = b'<meta charset="windows-1251">' + body.encode("windows-1251")
    out, _spans = extract_html(page)
    assert "Привет" in out and "�" not in out


def test_gt_inside_quoted_attr_does_not_truncate_meta():
    # WHATWG prescan tokenizes quoted values: the '>' inside content=""
    # must not end the tag and lose the charset declaration
    page = (
        b'<meta http-equiv=content-type '
        b'content="a > b; charset=koi8-r">'
        + "<p>Привет</p>".encode("koi8-r")
    )
    text, codec = sniff_decode(page)
    assert codec == "koi8-r" and "Привет" in text


@pytest.mark.parametrize(
    "label", [b"utf-7", b"UTF-7", b"hz-gb-2312", b"iso-2022-kr"]
)
def test_dangerous_labels_rejected(label):
    # utf-7 is not a WHATWG encoding and hz/iso-2022-kr map to the
    # replacement encoding; Python's codec registry would decode them,
    # so the resolver must reject the label (scan continues to the
    # next meta / fallback) instead of decoding
    page = (
        b"<meta charset=" + label + b">"
        b"<meta charset=windows-1251>" + "<p>Привет</p>".encode("windows-1251")
    )
    text, codec = sniff_decode(page)
    assert codec == "windows-1251" and "Привет" in text
    # and with no later meta, fall through to the UTF-8 path
    _, codec2 = sniff_decode(b"<meta charset=" + label + b"><p>hi</p>")
    assert codec2 not in ("utf-7", "hz")


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_sniff_decode_total(data):
    text, codec = sniff_decode(data)
    assert isinstance(text, str) and isinstance(codec, str)
