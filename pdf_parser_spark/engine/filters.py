"""Stream decode filters (reference: /root/reference/src/decode/).

``/Filter`` may be a single Name or an Array applied in order
(mod.rs:10-51).  FlateDecode is zlib inflate (flate.rs:7-16 — C-backed
``zlib`` here, the hottest byte-level op).  ASCIIHexDecode skips
whitespace, stops at ``>``, pads an odd trailing nibble with 0
(mod.rs:54-71).  Any other filter raises :class:`UnsupportedFilter`,
which the Spark layer converts into a row-level ``decode_error``.
"""

from __future__ import annotations

import zlib

from pdf_parser_spark.engine.errors import (
    DecompressError,
    InvalidStructure,
    ParseError,
    UnsupportedFilter,
)
from pdf_parser_spark.engine.objects import Name

_HEXVAL = {c: int(chr(c), 16) for c in b"0123456789abcdefABCDEF"}
# u8::is_ascii_whitespace — space \t \n \x0c \r (NOT vertical tab)
_WS = frozenset(b" \t\n\x0c\r")


def flate_decode(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error as e:
        raise DecompressError(f"FlateDecode failed: {e}") from None


def ascii_hex_decode(data: bytes) -> bytes:
    out = bytearray()
    nibbles = [b for b in data if b not in _WS]
    i = 0
    n = len(nibbles)
    while i < n:
        h1 = nibbles[i]
        if h1 == 0x3E:  # '>' end-of-data marker
            break
        h2 = nibbles[i + 1] if i + 1 < n else 0x30  # pad odd nibble with '0'
        i += 2
        v1 = _HEXVAL.get(h1)
        v2 = _HEXVAL.get(h2)
        if v1 is None:
            raise ParseError(0, f"Invalid hex char: {chr(h1)}")
        if v2 is None:
            raise ParseError(0, f"Invalid hex char: {chr(h2)}")
        out.append((v1 << 4) | v2)
    return bytes(out)


_FILTERS = {
    "FlateDecode": flate_decode,
    "ASCIIHexDecode": ascii_hex_decode,
}


def get_filters(stream_dict: dict) -> list[str]:
    f = stream_dict.get("Filter")
    if f is None:
        return []
    if isinstance(f, Name):
        return [str(f)]
    if isinstance(f, list):
        names = []
        for item in f:
            if not isinstance(item, Name):
                raise InvalidStructure("Filter must be name")
            names.append(str(item))
        return names
    raise InvalidStructure("Invalid Filter type")


def decode_stream(stream_dict: dict, data: bytes) -> bytes:
    filters = get_filters(stream_dict)
    result = data
    for name in filters:
        fn = _FILTERS.get(name)
        if fn is None:
            raise UnsupportedFilter(name)
        result = fn(result)
    return result
