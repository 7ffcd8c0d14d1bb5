"""Recursive-descent PDF object parser over the token stream.

Reimplements /root/reference/src/parser/object.rs: primitives,
``n g R`` references via 2-token pushback lookahead (:80-110), arrays
(:113-136), dicts with Name keys and the dict-vs-stream decision
(:139-184), exact-``/Length`` stream reads with the
scan-for-``endstream`` fallback when ``/Length`` is an indirect
reference (:187-254).
"""

from __future__ import annotations

import re as _re

from pdf_parser_spark.engine.errors import ParseError
from pdf_parser_spark.engine.lexer import Lexer
from pdf_parser_spark.engine.objects import NULL, Name, Ref, Stream

# One C-level probe for the ``gen R`` tail of an indirect reference —
# replaces the two-token pushback lookahead on the hot path.  The
# whitespace/comment prefixes and the int/keyword boundaries mirror
# the lexer exactly (atomic, so no backtracking into comments); any
# non-matching shape falls back to the token-level lookahead with
# identical semantics and error behavior.
_GEN_REF_RE = _re.compile(
    rb"(?>(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*[\r\n]?)*)"
    rb"([0-9]+)(?![0-9.])"
    rb"(?>(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*[\r\n]?)*)"
    rb"R(?![A-Za-z])"
)

# One C-level probe for a whole ``/Key value`` dictionary entry — the
# dominant cost of structure parsing (page tree, font dicts, trailer)
# was one Python-level token round-trip per token.  Fast-pathed value
# shapes: name, unsigned ``n g R`` reference, a TERMINAL number (the
# lookahead requires the next token to be another key or the dict
# close, so an int that is really the start of a reference can never
# be taken), and an all-numeric array.  Subpatterns (whitespace +
# comments, name charset incl. the ``(?!#)`` escape guard, int/real
# split, keyword boundary after R) mirror lexer.py's _LEX_RE exactly;
# every non-matching entry falls back to the token path with identical
# semantics, so this is a pure fast path.
_WSC = rb"(?>(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*[\r\n]?)*)"
_LEXNAME = rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%#]*"
_LEXNUM = rb"[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+|[0-9]+(?![0-9.]))"
_DICT_ENTRY_RE = _re.compile(
    # name groups are ATOMIC (like lexer.py's _LEX_RE): without (?>...)
    # backtracking can split a name to satisfy the (?!#) guard or peel
    # trailing digits into a fake value — '/My#20Font' must fall back
    # to the token path whole, never half-match as vn='M'
    _WSC
    + rb"/(?>(?P<k>" + _LEXNAME + rb"))(?!#)"
    + _WSC
    + rb"(?:"
    + rb"/(?>(?P<vn>" + _LEXNAME + rb"))(?!#)"
    + rb"|(?P<vo>[0-9]+)(?![0-9.])" + _WSC
    + rb"(?P<vg>[0-9]+)(?![0-9.])" + _WSC + rb"R(?![A-Za-z])"
    + rb"|(?P<vnum>" + _LEXNUM + rb")(?=" + _WSC + rb"(?:/|>>))"
    + rb"|\[(?P<varr>(?:" + _WSC + _LEXNUM + rb")*)" + _WSC + rb"\]"
    + rb"|\[(?P<vrefs>(?:"
    + _WSC + rb"[0-9]+(?![0-9.])" + _WSC + rb"[0-9]+(?![0-9.])"
    + _WSC + rb"R(?![A-Za-z]))+)" + _WSC + rb"\]"
    + rb")"
)
_NUM_RE = _re.compile(_LEXNUM)
_COMMENT_RE = _re.compile(rb"%[^\r\n]*")
# dict close / post-dict keyword probes (fast paths in
# _parse_dict_or_stream); keyword boundary mirrors the lexer's
# maximal alpha run
_DICT_END_RE = _re.compile(_WSC + rb">>")
_STREAM_KW_RE = _re.compile(
    _WSC + rb"(?:(stream)|endobj)(?![A-Za-z])"
)

_I64_MAX = 2**63  # exclusive bound; fast-path ints are non-negative


class _TokenPath(Exception):
    """Internal: a fast-path value the lexer would REJECT (i64
    overflow) — re-parse through the token path so the error message
    and position match the reference exactly."""
# pair extraction for an all-reference array value (e.g. /Kids):
# matched AFTER vrefs already validated the shape, so bare groups
_REF_PAIR_RE = _re.compile(
    _WSC + rb"([0-9]+)" + _WSC + rb"([0-9]+)" + _WSC + rb"R"
)


class Parser:
    __slots__ = ("lexer", "peeked")

    def __init__(self, data: bytes):
        self.lexer = Lexer(data)
        self.peeked: list = []  # pushback stack for ref lookahead

    @property
    def position(self) -> int:
        return self.lexer.pos

    def seek(self, pos: int) -> None:
        self.lexer.seek(pos)
        self.peeked.clear()

    def _next_token(self):
        if self.peeked:
            return self.peeked.pop()
        return self.lexer.next_token()

    def _push_back(self, tok) -> None:
        self.peeked.append(tok)

    def parse_object(self):
        """Parse one object; ``None`` at EOF or on ``endobj``."""
        tok = self._next_token()
        if tok is None:
            return None
        kind, value = tok
        if kind == "null":
            return NULL
        if kind == "bool":
            return value
        if kind == "real":
            return value
        if kind in ("str", "hexstr"):
            return value
        if kind == "name":
            return Name(value)
        if kind == "[":
            return self._parse_array()
        if kind == "<<":
            return self._parse_dict_or_stream()
        if kind == "int":
            return self._parse_int_or_ref(value)
        if kind == "obj":
            # skip the keyword, parse the wrapped object
            return self.parse_object()
        if kind == "endobj":
            return None
        raise ParseError(self.position, f"Unexpected token: {kind}")

    def _parse_int_or_ref(self, first: int):
        """``42`` vs ``42 0 R`` via two-token lookahead
        (object.rs:80-110)."""
        if not self.peeked:
            m = _GEN_REF_RE.match(self.lexer.data, self.lexer.pos)
            if m is not None:
                gen = int(m.group(1))
                if gen < _I64_MAX:  # else: token path raises like the lexer
                    self.lexer.pos = m.end()
                    return Ref(first & 0xFFFFFFFF, gen & 0xFFFF)
        tok2 = self._next_token()
        if tok2 is None:
            return first
        if tok2[0] != "int":
            self._push_back(tok2)
            return first
        tok3 = self._next_token()
        if tok3 is None:
            self._push_back(tok2)
            return first
        if tok3[0] == "R":
            return Ref(first & 0xFFFFFFFF, tok2[1] & 0xFFFF)
        self._push_back(tok3)
        self._push_back(tok2)
        return first

    def _parse_array(self) -> list:
        items = []
        while True:
            tok = self._next_token()
            if tok is None:
                raise ParseError(self.position, "Unterminated array")
            if tok[0] == "]":
                break
            self._push_back(tok)
            obj = self.parse_object()
            if obj is not None:
                items.append(obj)
        return items

    def _parse_dict_or_stream(self):
        d: dict = {}
        entry = _DICT_ENTRY_RE.match
        lexer = self.lexer
        while True:
            if not self.peeked:
                m = entry(lexer.data, lexer.pos)
                if m is not None:
                    # positional unpack: the pattern has exactly these
                    # 7 capture groups in order (7 named lookups cost
                    # ~3x one groups() call on hot page/font dicts)
                    k, vn, vo, vg, vnum, varr, vrefs = m.groups()
                    try:
                        key = k.decode("utf-8")
                        if vn is not None:
                            value = Name(vn.decode("utf-8"))
                        elif vo is not None:
                            no, ng = int(vo), int(vg)
                            if no >= _I64_MAX or ng >= _I64_MAX:
                                raise _TokenPath  # lexer rejects i64 overflow
                            value = Ref(no & 0xFFFFFFFF, ng & 0xFFFF)
                        elif vnum is not None:
                            if b"." in vnum:
                                value = float(vnum)
                            else:
                                value = int(vnum)
                                if abs(value) >= _I64_MAX:
                                    raise _TokenPath
                        elif vrefs is not None:
                            # all-reference array (/Kids, /Contents)
                            pairs = [
                                (int(n), int(g))
                                for n, g in _REF_PAIR_RE.findall(vrefs)
                            ]
                            if any(
                                n >= _I64_MAX or g >= _I64_MAX
                                for n, g in pairs
                            ):
                                raise _TokenPath
                            value = [
                                Ref(n & 0xFFFFFFFF, g & 0xFFFF)
                                for n, g in pairs
                            ]
                        else:
                            # the _WSC between numbers folds %-comments
                            # into the capture; strip them before the
                            # bare-number findall or a comment like
                            # '%c 2' injects phantom array elements
                            if b"%" in varr:
                                varr = _COMMENT_RE.sub(b"", varr)
                            value = [
                                float(t) if b"." in t else int(t)
                                for t in _NUM_RE.findall(varr)
                            ]
                            if any(
                                isinstance(t, int) and abs(t) >= _I64_MAX
                                for t in value
                            ):
                                raise _TokenPath
                    except (UnicodeDecodeError, _TokenPath):
                        pass  # exotic name bytes / i64 overflow:
                        # token path parses (and raises) identically
                    else:
                        d[key] = value
                        lexer.pos = m.end()
                        continue
                m = _DICT_END_RE.match(lexer.data, lexer.pos)
                if m is not None:
                    lexer.pos = m.end()
                    break
            tok = self._next_token()
            if tok is None:
                raise ParseError(self.position, "Unterminated dictionary")
            if tok[0] == ">>":
                break
            if tok[0] != "name":
                raise ParseError(
                    self.position, f"Dictionary key must be name, got {tok[0]}"
                )
            key = tok[1]
            value = self.parse_object()
            if value is None:
                raise ParseError(self.position, "Missing dictionary value")
            d[key] = value

        # dict vs stream: look one token ahead, rewind if not a stream.
        # Fast probes for the two overwhelmingly common next tokens
        # ('stream' / 'endobj') skip the token round-trip; keyword
        # boundaries mirror the lexer's maximal alpha run.  Any other
        # shape takes the token path with identical error behavior.
        if not self.peeked:
            m = _STREAM_KW_RE.match(self.lexer.data, self.lexer.pos)
            if m is not None:
                if m.group(1) is not None:  # 'stream'
                    self.lexer.pos = m.end()
                    data = self._read_stream_data(d)
                    return Stream(d, data)
                return d  # 'endobj': plain dict, position unchanged
        pos_after_dict = self.lexer.pos
        tok = self._next_token()
        if tok is not None and tok[0] == "stream":
            data = self._read_stream_data(d)
            return Stream(d, data)
        self.lexer.seek(pos_after_dict)
        self.peeked.clear()
        return d

    def _read_stream_data(self, d: dict) -> bytes:
        self.lexer.skip_whitespace()
        length = d.get("Length")
        if isinstance(length, Ref):
            # indirect /Length: scan for the endstream marker instead
            return self._read_stream_until_endstream()
        if not isinstance(length, int) or isinstance(length, bool):
            raise ParseError(self.position, "Stream missing Length")

        start = self.lexer.pos
        end = start + length
        data = self.lexer.data
        if end > len(data) or length < 0:
            raise ParseError(start, "Stream data extends past EOF")
        payload = data[start:end]
        self.lexer.seek(end)

        self.lexer.skip_whitespace()
        tok = self._next_token()
        if tok is not None and tok[0] == "endstream":
            return payload
        raise ParseError(self.position, "Missing endstream")

    def _read_stream_until_endstream(self) -> bytes:
        start = self.lexer.pos
        data = self.lexer.data
        marker = b"endstream"
        idx = data.find(marker, start)
        # the reference's scan bound is exclusive (object.rs:242), so a
        # marker flush against EOF is never matched — keep that boundary
        if idx == -1 or idx == len(data) - len(marker):
            raise ParseError(start, "Could not find endstream")
        payload = data[start:idx]
        self.lexer.seek(idx + len(marker))
        return payload
