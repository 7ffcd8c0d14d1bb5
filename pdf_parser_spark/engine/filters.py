"""Stream decode filters (reference: /root/reference/src/decode/).

``/Filter`` may be a single Name or an Array applied in order
(mod.rs:10-51).  FlateDecode is zlib inflate (flate.rs:7-16 — C-backed
``zlib`` here, the hottest byte-level op).  ASCIIHexDecode skips
whitespace, stops at ``>``, pads an odd trailing nibble with 0
(mod.rs:54-71).  Any other filter raises :class:`UnsupportedFilter`,
which the Spark layer converts into a row-level ``decode_error``.

Extended mode (``extended=True``, off by default): real Common-Crawl
PDFs constantly use LZWDecode / ASCII85Decode / RunLengthDecode and
PNG-predictored Flate (xref streams with /Predictor 12 especially), so
at corpus scale a large fraction of documents would land in
``decode_error`` under the reference-faithful dispatch.  The extension
implements those public-spec algorithms (PDF 32000-1:2008 §7.4) in
pure stdlib Python and is opt-in precisely so the default path stays
byte-identical to the reference, which errors on every one of them
(decode/mod.rs:45-51).
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


# -- extended (opt-in) filters: PDF 32000-1:2008 §7.4 -------------------


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZWDecode (§7.4.4): 9→12-bit variable-width codes, MSB-first;
    256 = clear table, 257 = EOD.  ``early_change`` (DecodeParms
    default 1) widens the code one entry before the table fills."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 257:
                    raise DecompressError("LZWDecode: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise DecompressError("LZWDecode: code out of range")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3): 5 chars → 4 bytes base-85, ``z`` = four
    zero bytes, terminated by ``~>``; whitespace skipped."""
    out = bytearray()
    group: list[int] = []
    if data.startswith(b"<~"):  # optional Adobe-style opener
        data = data[2:]
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS or c == 0x0B:
            i += 1
            continue
        if c == 0x7E:  # '~' — end marker
            break
        if c == 0x7A:  # 'z'
            if group:
                raise ParseError(i, "ASCII85Decode: z inside group")
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= c <= 0x75:  # '!'..'u'
            raise ParseError(i, f"ASCII85Decode: invalid char {chr(c)!r}")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ParseError(i, "ASCII85Decode: group overflow")
            out += v.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise ParseError(i, "ASCII85Decode: lone trailing char")
        k = len(group)
        v = 0
        for g in group + [84] * (5 - k):  # pad with 'u'
            v = v * 85 + g
        if v > 0xFFFFFFFF:
            # e.g. a trailing "uu": padded value exceeds 2^32-1 — must
            # be a ParseError (-> decode_error row), matching the
            # full-group path; an unchecked to_bytes would raise
            # OverflowError and kill the Spark task instead
            raise ParseError(i, "ASCII85Decode: trailing group overflow")
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def run_length_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): length byte 0-127 copies length+1
    literal bytes; 129-255 repeats the next byte 257-length times;
    128 = EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            chunk = data[i + 1 : i + 2 + ln]
            if len(chunk) != ln + 1:
                raise DecompressError("RunLengthDecode: truncated literal")
            out += chunk
            i += 2 + ln
        else:
            if i + 1 >= n:
                raise DecompressError("RunLengthDecode: truncated run")
            out += bytes([data[i + 1]]) * (257 - ln)
            i += 2
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def apply_predictor(data: bytes, parms: dict) -> bytes:
    """Undo the /Predictor transform (§7.4.4.4) after Flate/LZW.

    Predictor 2 = TIFF horizontal differencing (8-bit components
    only); 10-15 = PNG per-row filters (None/Sub/Up/Average/Paeth,
    chosen per row by a leading tag byte).
    """
    pred = _parm_int(parms, "Predictor", 1)
    if pred <= 1:
        return data
    colors = _parm_int(parms, "Colors", 1)
    bpc = _parm_int(parms, "BitsPerComponent", 8)
    columns = _parm_int(parms, "Columns", 1)
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel
    rowlen = (colors * bpc * columns + 7) // 8
    if pred == 2:
        if bpc != 8:
            raise UnsupportedFilter(f"TIFF predictor with {bpc}-bit components")
        out = bytearray(data)
        for r0 in range(0, len(out) - rowlen + 1, rowlen):
            for j in range(r0 + bpp, r0 + rowlen):
                out[j] = (out[j] + out[j - bpp]) & 0xFF
        return bytes(out)
    if not 10 <= pred <= 15:
        raise UnsupportedFilter(f"Predictor {pred}")
    # PNG predictors: each row is (tag, rowlen bytes)
    out = bytearray()
    prior = bytearray(rowlen)
    i, n = 0, len(data)
    while i < n:
        tag = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        if len(row) < rowlen:
            raise DecompressError("predictor: truncated row")
        i += 1 + rowlen
        if tag == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif tag == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prior[j]) & 0xFF
        elif tag == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prior[j]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                ul = prior[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + _paeth(left, prior[j], ul)) & 0xFF
        elif tag != 0:
            raise DecompressError(f"predictor: bad PNG filter tag {tag}")
        out += row
        prior = row
    return bytes(out)


def _parm_int(parms: dict, key: str, default: int) -> int:
    v = parms.get(key, default)
    if isinstance(v, bool) or not isinstance(v, int):
        return default
    return v


_EXTENDED_FILTERS = {
    "LZWDecode": lzw_decode,
    "LZW": lzw_decode,
    "ASCII85Decode": ascii85_decode,
    "A85": ascii85_decode,
    "RunLengthDecode": run_length_decode,
    "RL": run_length_decode,
    "AHx": ascii_hex_decode,
    "Fl": flate_decode,
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


def _get_parms(stream_dict: dict, n_filters: int) -> list[dict]:
    """/DecodeParms (or legacy /DP) aligned to the filter list; missing
    or non-dict entries (including unresolved indirect refs — this
    layer has no document access) become empty dicts."""
    p = stream_dict.get("DecodeParms", stream_dict.get("DP"))
    if isinstance(p, dict):
        parms = [p] + [{}] * (n_filters - 1)
    elif isinstance(p, list):
        parms = [x if isinstance(x, dict) else {} for x in p]
        parms += [{}] * (n_filters - len(parms))
    else:
        parms = [{}] * n_filters
    return parms


def decode_stream(
    stream_dict: dict, data: bytes, extended: bool = False
) -> bytes:
    """Apply the /Filter chain.  Default dispatch is reference-exact
    (FlateDecode + ASCIIHexDecode only, decode/mod.rs:45-51);
    ``extended=True`` additionally dispatches LZW/ASCII85/RunLength
    and undoes /Predictor after Flate/LZW."""
    filters = get_filters(stream_dict)
    result = data
    if not extended:
        for name in filters:
            fn = _FILTERS.get(name)
            if fn is None:
                raise UnsupportedFilter(name)
            result = fn(result)
        return result

    parms = _get_parms(stream_dict, len(filters))
    for name, parm in zip(filters, parms):
        if name in ("LZWDecode", "LZW"):
            result = lzw_decode(result, _parm_int(parm, "EarlyChange", 1))
            result = apply_predictor(result, parm)
        elif name in ("FlateDecode", "Fl"):
            result = flate_decode(result)
            result = apply_predictor(result, parm)
        else:
            fn = _FILTERS.get(name) or _EXTENDED_FILTERS.get(name)
            if fn is None:
                raise UnsupportedFilter(name)
            result = fn(result)
    return result
