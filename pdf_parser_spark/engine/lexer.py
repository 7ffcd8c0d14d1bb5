"""Byte-level PDF tokenizer.

Reimplements the token semantics of the reference lexer
(/root/reference/src/parser/lexer.rs:100-355): PDF whitespace
(incl. NUL and form-feed) and ``%`` comments, integers/reals with a
single decimal point, keywords, literal strings with the full escape
set (named escapes, 1-3 digit octal, line continuations, nested
parens), whitespace-tolerant hex strings with odd-nibble zero padding,
and names with ``#xx`` hex escapes.

Tokens are ``(kind, value)`` tuples; delimiter/keyword tokens carry
``None`` as value.  Kinds: ``int real str hexstr name null bool [ ]
<< >> obj endobj stream endstream R xref trailer startxref``.
"""

from __future__ import annotations

from pdf_parser_spark.engine.errors import InvalidUtf8, ParseError

WHITESPACE = frozenset(b" \t\n\r\x0c\x00")
NAME_DELIMS = frozenset(b" \t\n\r\x0c\x00()<>[]{}/%")
DIGITS = frozenset(b"0123456789")
OCTAL = frozenset(b"01234567")
HEXDIGITS = frozenset(b"0123456789abcdefABCDEF")
ALPHA = frozenset(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

_KEYWORDS = {
    b"null": ("null", None),
    b"true": ("bool", True),
    b"false": ("bool", False),
    b"obj": ("obj", None),
    b"endobj": ("endobj", None),
    b"stream": ("stream", None),
    b"endstream": ("endstream", None),
    b"R": ("R", None),
    b"xref": ("xref", None),
    b"trailer": ("trailer", None),
    b"startxref": ("startxref", None),
}

_HEXVAL = {c: int(chr(c), 16) for c in HEXDIGITS}

# Fast path: one C-level match for the common token classes, with the
# byte-at-a-time readers kept as the (identical-semantics) fallback
# for strings, hex strings, '#'-escaped names, and error cases.  The
# whitespace/comment prefix mirrors skip_whitespace exactly (comments
# consume through one CR or LF).  Numbers mirror _read_number's
# maximal munch: a real stops at its second '.', an int must not be
# followed by '.', and malformed signs fall through to the fallback
# so error positions/messages stay identical.
import re as _re

_LEX_RE = _re.compile(
    # atomic: a failed alternation must NOT backtrack into a comment
    # and tokenize its text
    rb"(?>(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*[\r\n]?)*)"
    rb"(?:"
    rb"(?P<real>[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+))"
    rb"|(?P<int>[+-]?[0-9]+)(?![0-9.])"
    rb"|/(?>(?P<name>[^\x00\t\n\x0c\r ()<>\[\]{}/%#]*))(?!#)"
    rb"|(?P<kw>[A-Za-z]+)"
    rb"|(?P<dopen><<)"
    rb"|(?P<dclose>>>)"
    rb"|(?P<aopen>\[)"
    rb"|(?P<aclose>\])"
    rb"|(?P<end>\Z)"
    rb")"
)


def hex_value(b: int) -> int:
    """Permissive hex-digit value; non-hex bytes count as 0
    (reference: parser/lexer.rs:359-366)."""
    return _HEXVAL.get(b, 0)


class Lexer:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def seek(self, pos: int) -> None:
        self.pos = pos

    def skip_whitespace(self) -> None:
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos < n:
            b = data[pos]
            if b in WHITESPACE:
                pos += 1
            elif b == 0x25:  # '%' comment runs to end of line
                pos += 1
                while pos < n:
                    c = data[pos]
                    pos += 1
                    if c in (0x0A, 0x0D):
                        break
            else:
                break
        self.pos = pos

    def next_token(self):
        """Return the next ``(kind, value)`` token or ``None`` at EOF."""
        m = _LEX_RE.match(self.data, self.pos)
        if m is not None:
            g = m.lastgroup
            if g == "int":
                v = int(m.group("int"))
                # the reference parses i64 (lexer.rs:183): out-of-range
                # integers are a parse ERROR there, not a value —
                # Python's unbounded int() must reject the same range
                # with the same message
                if not (-(2**63) <= v < 2**63):
                    raise ParseError(
                        m.start("int"),
                        "Invalid integer: "
                        + m.group("int").decode("latin-1"),
                    )
                self.pos = m.end()
                return ("int", v)
            if g == "name":
                self.pos = m.end()
                raw = m.group("name")
                try:
                    return ("name", raw.decode("utf-8"))
                except UnicodeDecodeError:
                    raise InvalidUtf8("Invalid UTF-8 in name") from None
            if g == "kw":
                tok = _KEYWORDS.get(m.group("kw"))
                if tok is not None:
                    self.pos = m.end()
                    return tok
                self.pos = m.end()  # same post-raise pos as the reader
                raise ParseError(
                    m.start("kw"),
                    f"Unknown keyword: {m.group('kw').decode('latin-1')}",
                )
            if g == "real":
                self.pos = m.end()
                return ("real", float(m.group("real")))
            if g == "dopen":
                self.pos = m.end()
                return ("<<", None)
            if g == "dclose":
                self.pos = m.end()
                return (">>", None)
            if g == "aopen":
                self.pos = m.end()
                return ("[", None)
            if g == "aclose":
                self.pos = m.end()
                return ("]", None)
            if g == "end":
                self.pos = m.end()
                return None
        # strings, hex strings, '#'-escaped names, malformed input
        return self._next_token_slow()

    def _next_token_slow(self):
        self.skip_whitespace()
        data, n = self.data, len(self.data)
        pos = self.pos
        if pos >= n:
            return None
        b = data[pos]
        if b == 0x5B:  # [
            self.pos = pos + 1
            return ("[", None)
        if b == 0x5D:  # ]
            self.pos = pos + 1
            return ("]", None)
        if b == 0x3C:  # <
            if pos + 1 < n and data[pos + 1] == 0x3C:
                self.pos = pos + 2
                return ("<<", None)
            self.pos = pos + 1
            return ("hexstr", self._read_hex_string())
        if b == 0x3E:  # >
            if pos + 1 < n and data[pos + 1] == 0x3E:
                self.pos = pos + 2
                return (">>", None)
            self.pos = pos + 1
            raise ParseError(self.pos, "Unexpected '>'")
        if b == 0x28:  # (
            return ("str", self._read_literal_string())
        if b == 0x2F:  # /
            return ("name", self._read_name())
        if b in DIGITS or b in (0x2B, 0x2D, 0x2E):  # digit + - .
            return self._read_number()
        if b in ALPHA:
            return self._read_keyword()
        raise ParseError(pos, f"Unexpected byte: 0x{b:02X}")

    # -- token readers -------------------------------------------------

    def _read_number(self):
        """Sign, digits, at most one decimal point
        (reference: parser/lexer.rs:149-189)."""
        data, n = self.data, len(self.data)
        start = pos = self.pos
        if data[pos] in (0x2B, 0x2D):
            pos += 1
        has_decimal = False
        while pos < n:
            c = data[pos]
            if c in DIGITS:
                pos += 1
            elif c == 0x2E and not has_decimal:
                has_decimal = True
                pos += 1
            else:
                break
        self.pos = pos
        text = data[start:pos]
        try:
            if has_decimal:
                return ("real", float(text))
            return ("int", int(text))
        except ValueError:
            raise ParseError(
                start, f"Invalid number: {text.decode('latin-1')}"
            ) from None

    def _read_keyword(self):
        data, n = self.data, len(self.data)
        start = pos = self.pos
        while pos < n and data[pos] in ALPHA:
            pos += 1
        self.pos = pos
        word = data[start:pos]
        tok = _KEYWORDS.get(word)
        if tok is None:
            raise ParseError(start, f"Unknown keyword: {word.decode('latin-1')}")
        return tok

    def _read_literal_string(self) -> bytes:
        """``(...)`` with escapes, octal and nested parens
        (reference: parser/lexer.rs:222-283)."""
        data, n = self.data, len(self.data)
        pos = self.pos + 1  # opening '('
        out = bytearray()
        depth = 1
        while depth > 0:
            if pos >= n:
                raise ParseError(pos, "Unexpected end of file")
            b = data[pos]
            pos += 1
            if b == 0x28:  # (
                depth += 1
                out.append(b)
            elif b == 0x29:  # )
                depth -= 1
                if depth > 0:
                    out.append(b)
            elif b == 0x5C:  # backslash
                if pos >= n:
                    raise ParseError(pos, "Unexpected end of file")
                e = data[pos]
                pos += 1
                if e == 0x6E:  # n
                    out.append(0x0A)
                elif e == 0x72:  # r
                    out.append(0x0D)
                elif e == 0x74:  # t
                    out.append(0x09)
                elif e == 0x62:  # b
                    out.append(0x08)
                elif e == 0x66:  # f
                    out.append(0x0C)
                elif e in (0x28, 0x29, 0x5C):
                    out.append(e)
                elif e in OCTAL:
                    val = e - 0x30
                    for _ in range(2):
                        if pos < n and data[pos] in OCTAL:
                            val = val * 8 + (data[pos] - 0x30)
                            pos += 1
                        else:
                            break
                    out.append(val & 0xFF)
                elif e == 0x0D:  # line continuation \<CR>[<LF>]
                    if pos < n and data[pos] == 0x0A:
                        pos += 1
                elif e == 0x0A:  # line continuation \<LF>
                    pass
                else:
                    out.append(e)
            else:
                out.append(b)
        self.pos = pos
        return bytes(out)

    def _read_hex_string(self) -> bytes:
        """``<...>`` hex string; internal whitespace allowed, odd
        nibble padded with 0 (reference: parser/lexer.rs:286-325)."""
        data, n = self.data, len(self.data)
        pos = self.pos  # opening '<' already consumed
        nibbles = bytearray()
        while True:
            while pos < n and data[pos] in (0x20, 0x09, 0x0A, 0x0D):
                pos += 1
            if pos >= n:
                raise ParseError(pos, "Unexpected end of file")
            b = data[pos]
            pos += 1
            if b == 0x3E:  # >
                break
            if b in HEXDIGITS:
                nibbles.append(b)
            else:
                raise ParseError(pos - 1, f"Invalid hex char: 0x{b:02X}")
        self.pos = pos
        if len(nibbles) % 2 == 1:
            nibbles.append(0x30)
        return bytes(
            (_HEXVAL[nibbles[i]] << 4) | _HEXVAL[nibbles[i + 1]]
            for i in range(0, len(nibbles), 2)
        )

    def _read_name(self) -> str:
        """``/Name`` with ``#xx`` escapes (reference: parser/lexer.rs:328-355)."""
        data, n = self.data, len(self.data)
        pos = self.pos + 1  # '/'
        out = bytearray()
        while pos < n:
            b = data[pos]
            if b in NAME_DELIMS:
                break
            if b == 0x23:  # '#'
                if pos + 2 >= n:
                    raise ParseError(pos, "Unexpected end of file")
                out.append((hex_value(data[pos + 1]) << 4) | hex_value(data[pos + 2]))
                pos += 3
            else:
                out.append(b)
                pos += 1
        self.pos = pos
        try:
            return out.decode("utf-8")
        except UnicodeDecodeError:
            raise InvalidUtf8("Invalid UTF-8 in name") from None
