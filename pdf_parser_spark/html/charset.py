"""Charset sniffing for web-crawl HTML bytes (HTML5 prescan).

Common-Crawl-scale reality: a large minority of pages are not UTF-8
(windows-125x, iso-8859-*, shift_jis, gbk, euc-kr, …), and decoding
them as UTF-8-with-replacement shreds every non-ASCII character into
U+FFFD before the boilerplate stripper ever sees the text.  This
module implements the deterministic detection cascade the HTML5 spec
prescribes (WHATWG HTML §13.2.3.2 "determining the character
encoding" — public), without any statistical guessing so the result
is a pure function of the bytes:

1. **BOM** (highest priority, overrides everything): UTF-8,
   UTF-16 LE/BE.
2. **meta prescan** over the first ``PRESCAN_BYTES`` bytes:
   ``<meta charset=X>`` or
   ``<meta http-equiv=content-type content="...; charset=X">``.
3. **Fallback**: try strict UTF-8; on failure **windows-1252** (the
   WHATWG default for the no-information case — a superset of
   latin-1 in the 0x80-0x9F range, and total: every byte decodes).

Label → codec mapping follows the WHATWG encoding registry for the
labels that matter at crawl scale; x-user-defined and unknown labels
fall through to the fallback chain.  UTF-16 meta declarations are
ignored per spec (a 16-bit page that reached the ASCII prescan isn't
UTF-16) and treated as UTF-8.

Pure stdlib codecs — deterministic on every platform — and total:
``sniff_decode`` never raises, whatever the bytes.
"""

from __future__ import annotations

import codecs
import re

PRESCAN_BYTES = 1024

# WHATWG label → Python codec, for the high-traffic labels.  Python's
# codec registry already accepts most spellings; this map pins the
# WHATWG-mandated differences (latin-1 family → windows-1252 etc.).
_WHATWG_ALIASES = {
    "unicode-1-1-utf-8": "utf-8",
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "l1": "windows-1252",
    "cp1252": "windows-1252",
    "windows-1252": "windows-1252",
    "iso-8859-9": "windows-1254",
    "latin5": "windows-1254",
    "cp1251": "windows-1251",
    "windows-1251": "windows-1251",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "ms932": "shift_jis",
    "gb2312": "gbk",
    "gb_2312": "gbk",
    "gbk": "gbk",
    "big5": "big5",
    "euc-jp": "euc-jp",
    "euc-kr": "euc-kr",
    "korean": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "koi8-r": "koi8-r",
    "koi8": "koi8-r",
    "tis-620": "cp874",
    "windows-874": "cp874",
    "iso-8859-11": "cp874",
}

# Prescan tokenization: skip comments (unterminated ones consume to the
# end of the window, as the spec's bogus-comment state does), then parse
# each <meta> tag's attributes.  A bare ``charset=`` match is NOT enough:
# per the spec only a ``charset`` attribute, or a ``content`` attribute
# on an ``http-equiv=content-type`` meta, declares an encoding — a
# charset= inside e.g. <meta name=description content="..."> or a
# commented-out tag must be ignored.
_COMMENT_RE = re.compile(rb"<!--.*?(?:-->|\Z)", re.S)
# Quote-aware tag body: the WHATWG prescan tokenizes quoted attribute
# values, so a '>' INSIDE quotes (content="a > b; charset=...") must not
# terminate the tag.  The three branches are disjoint on their first
# byte (", ', other), so the scan is deterministic; the head window is
# already bounded by PRESCAN_BYTES.
_META_TAG_RE = re.compile(
    rb"""<meta[\s/]((?:"[^"]*"|'[^']*'|[^>"'])*?)>""", re.IGNORECASE | re.S
)
_ATTR_RE = re.compile(
    rb"""([a-zA-Z][a-zA-Z0-9-]*)\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)"""
)
_CONTENT_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]{1,40})""", re.IGNORECASE
)


def _prescan_meta(head: bytes) -> str | None:
    """WHATWG meta prescan over the head window → resolved codec or None.

    Walks <meta> tags in order; an unresolvable label does not stop the
    scan (the spec keeps looking at later metas).
    """
    head = _COMMENT_RE.sub(b"", head)
    for tag in _META_TAG_RE.finditer(head):
        attrs: dict[bytes, bytes] = {}
        for am in _ATTR_RE.finditer(tag.group(1)):
            key = am.group(1).lower()
            if key not in attrs:  # spec: first occurrence wins
                attrs[key] = am.group(2).strip(b"\"'")
        label = attrs.get(b"charset")
        if label is None and b"content" in attrs:
            if attrs.get(b"http-equiv", b"").strip().lower() == b"content-type":
                cm = _CONTENT_CHARSET_RE.search(attrs[b"content"])
                if cm:
                    label = cm.group(1)
        if label is not None:
            codec = _resolve_label(label.decode("ascii", "replace"))
            if codec is not None:
                return codec
    return None


# WHATWG "replacement"-encoding labels + utf-7 (see _resolve_label)
_REJECTED_LABELS = frozenset(
    {
        "csiso2022kr",
        "hz-gb-2312",
        "iso-2022-cn",
        "iso-2022-cn-ext",
        "iso-2022-kr",
        "replacement",
        "utf-7",
        "unicode-1-1-utf-7",
        "csunicode11utf7",
        "x-unicode20utf7",
    }
)


def _resolve_label(label: str) -> str | None:
    """WHATWG label → Python codec name, or None if unusable."""
    label = label.strip().strip("\"'").lower()
    if not label:
        return None
    if label in _REJECTED_LABELS:
        # labels the WHATWG registry maps to the ``replacement``
        # encoding (legacy CJK escapements abused for XSS), plus
        # utf-7, which is not a WHATWG encoding at all — Python's
        # codec registry would happily decode these, so they must be
        # rejected BEFORE the codecs.lookup fallback
        return None
    codec = _WHATWG_ALIASES.get(label)
    if codec is None:
        try:
            codec = codecs.lookup(label).name
        except LookupError:
            return None
    if codec in ("utf-7", "hz"):
        return None
    if codec.startswith(("utf-16", "utf-32", "utf_16", "utf_32")):
        # spec: a 16/32-bit meta declaration on a byte-prescannable
        # page is a lie; treat as UTF-8
        return "utf-8"
    return codec


def _sniff(data: bytes) -> tuple[str, str, str | None]:
    """(codec, how, text) — ``text`` is the decoded document when the
    sniff itself already had to decode it (the strict-UTF-8 fallback
    probe), so the majority class of valid-UTF-8 crawl pages decodes
    exactly once per document."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", "bom", None
    if data.startswith(b"\xff\xfe"):
        return "utf-16-le", "bom", None
    if data.startswith(b"\xfe\xff"):
        return "utf-16-be", "bom", None
    codec = _prescan_meta(data[:PRESCAN_BYTES])
    if codec is not None:
        return codec, "meta", None
    try:
        return "utf-8", "fallback", data.decode("utf-8")
    except (UnicodeDecodeError, ValueError):
        return "windows-1252", "fallback", None


def sniff_encoding(data: bytes) -> tuple[str, str]:
    """(codec, how) — ``how`` is 'bom' | 'meta' | 'fallback'."""
    codec, how, _text = _sniff(bytes(data))
    return codec, how


def sniff_decode(data: bytes | bytearray | memoryview) -> tuple[str, str]:
    """Decode crawl HTML bytes to text: (text, codec_used).

    Total: a declared codec that fails mid-stream degrades to
    errors='replace' under the SAME codec (the spec's decoder is
    replacement-based too), so the result is always defined.
    """
    data = bytes(data)
    codec, _how, text = _sniff(data)
    if text is None:
        try:
            text = data.decode(codec)
        except (UnicodeDecodeError, ValueError):
            text = data.decode(codec, errors="replace")
    if codec.startswith("utf-16") and text.startswith("﻿"):
        # utf-8-sig strips its BOM; the utf-16-le/-be codecs do not
        text = text[1:]
    return text, codec
