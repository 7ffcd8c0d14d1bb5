"""HTML main-content extraction via shallow text features.

The reference contains no HTML code (its web/ dir is only a WASM demo
shell); the north rule adds "DOM-heuristic HTML boilerplate strip".
This module is designed from public literature — Kohlschütter et al.,
*Boilerplate Detection using Shallow Text Features* (WSDM 2010,
boilerpipe) with trafilatura-style precision rules — and structurally
mirrors the PDF layout classifier: tag-aware tokenize → block
segmentation (≈ layout L1) → per-block features (word count, link
density, tag class ≈ L4) → threshold classify → neighbor smoothing →
merge adjacent content (≈ L5) → render text (≈ S6).

Deterministic, stdlib-only (html.parser), no network, no external
models.  Pinned by this repo's golden fixtures (the reference defines
no HTML oracle).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# content inside these never contributes text
_IGNORED = frozenset(
    "script style noscript svg iframe form button select textarea "
    "option canvas template head title".split()
)
# structural containers that are boilerplate by position
_BOILERPLATE_SECTIONS = frozenset("nav header footer aside".split())
# tags that delimit text blocks
_BLOCK_TAGS = frozenset(
    "p div article section main h1 h2 h3 h4 h5 h6 li ul ol td th tr "
    "table blockquote pre figure figcaption br hr dl dt dd body".split()
)
_HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())

# words-per-block thresholds (boilerpipe's NumWords classifier family)
_MIN_WORDS_CONTENT = 10
_MAX_LINK_DENSITY = 0.333333


class Block:
    __slots__ = (
        "text_parts", "link_chars", "tag", "in_boiler", "depth",
        "_text", "_n_words",
    )

    def __init__(self, tag: str, in_boiler: bool, depth: int):
        self.text_parts: list[str] = []
        self.link_chars = 0
        self.tag = tag
        self.in_boiler = in_boiler
        self.depth = depth
        self._text: str | None = None
        self._n_words: int | None = None

    @property
    def text(self) -> str:
        # safe to cache: appends only happen while the block is
        # current, reads only at flush time and after
        t = self._text
        if t is None:
            t = self._text = " ".join(" ".join(self.text_parts).split())
        return t

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def n_words(self) -> int:
        n = self._n_words
        if n is None:
            n = self._n_words = len(self.text.split())
        return n

    @property
    def link_density(self) -> float:
        n = self.n_chars
        return self.link_chars / n if n else 0.0


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._current: Block | None = None
        self._ignore_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._tag_stack: list[str] = []

    # -- block lifecycle -------------------------------------------------

    def _flush(self) -> None:
        if self._current is not None and self._current.text:
            self.blocks.append(self._current)
        self._current = None

    def _open_block(self, tag: str) -> None:
        self._flush()
        self._current = Block(tag, self._boiler_depth > 0, len(self._tag_stack))

    # -- parser callbacks --------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _IGNORED:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag in _BOILERPLATE_SECTIONS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._open_block(tag)
        self._tag_stack.append(tag)

    def handle_endtag(self, tag):
        if tag in _IGNORED:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag in _BOILERPLATE_SECTIONS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
        while self._tag_stack and self._tag_stack[-1] != tag:
            self._tag_stack.pop()
        if self._tag_stack:
            self._tag_stack.pop()

    def handle_startendtag(self, tag, attrs):
        if tag in ("br", "hr") and not self._ignore_depth:
            self._flush()

    def handle_data(self, data):
        if self._ignore_depth or not data or data.isspace():
            return
        if self._current is None:
            self._current = Block("p", self._boiler_depth > 0, len(self._tag_stack))
        self._current.text_parts.append(data)
        if self._link_depth:
            self._current.link_chars += len(" ".join(data.split()))

    def close(self):
        super().close()
        self._flush()


_CDATA_ELEMS = ("script", "style")  # stdlib CDATA_CONTENT_ELEMENTS
# Tolerant-parsing regexes mirroring this Python's html.parser /
# _markupbase internals (PSF-licensed public source) so the fast
# tokenizer and the stdlib engine agree on malformed markup too:
# unmatched quotes, bare '/' in unquoted values, marked sections,
# bogus comments, '--   >' comment closes.
_LOCATE_START = re.compile(
    r"""
  <([a-zA-Z][^\t\n\r\f />\x00]*)   # tag name (captured; stdlib has no group)
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_TAGFIND_TOL = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND_TOL = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_COMMENT_CLOSE = re.compile(r"--\s*>")
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _CDATA_ELEMS
}
# Fast path for well-formed start tags (the overwhelming majority):
# restricted tag/attr-name charsets and quoted-or-bare values, never
# ending in a free '/'.  Every match here is also a _LOCATE_START
# match ending at the same '>' with attrfind tail '>', i.e. always a
# plain starttag — anything else falls through to the full stdlib
# logic.
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:_-]*)"
    r"(?:\s+[a-zA-Z:_-][a-zA-Z0-9:_.-]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?!['\"])[^>\s]*))?)*"
    r"\s*>"
)
# start-tag recovery: the char classes check_for_whole_start_tag treats
# as "incomplete input" rather than bogus-but-parseable
_INCOMPLETE_NEXT = frozenset("abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _fast_events(html: str):
    """Tokenize markup into (kind, value) events matching what
    ``HTMLParser(convert_charrefs=True)`` dispatches: kind 0 = data
    (entities resolved, one chunk per run), 1 = starttag, 2 = endtag,
    3 = startendtag.

    Malformed markup follows the stdlib's tolerant recovery exactly
    (quote only honored in attribute-value position via the stdlib's
    own locate regex; unclosed constructs re-emitted as data up to the
    next '>' or '<'), with ONE deliberate divergence pinned by
    tests/test_html_fast.py: a fragment with no recovery point before
    EOF is dropped instead of leaked into the text — the right call
    for extraction.  Differential equivalence with the stdlib engine
    is pinned per block over the fixture corpus and an adversarial
    malformed-markup suite.
    """
    from html import unescape

    pos, n = 0, len(html)
    find = html.find

    def tolerant(lt: int):
        # goahead()'s k<0 recovery at end-of-input: data up to the
        # next '>' (inclusive) else next '<', else drop (divergence)
        gt = find(">", lt + 1)
        if gt >= 0:
            return lt, gt + 1
        k = find("<", lt + 1)
        if k < 0:
            return None, n
        return lt, k

    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            lt = n
        if lt > pos:
            chunk = html[pos:lt]
            if "&" in chunk:
                chunk = unescape(chunk)
            yield 0, chunk
        if lt >= n:
            break
        nxt = html[lt + 1 : lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                m = _COMMENT_CLOSE.search(html, lt + 4)
                if m:
                    pos = m.end()
                    continue
            elif html.startswith("<![", lt):
                # marked section (parse_marked_section); where the
                # stdlib would assert on an unknown/missing section
                # name we recover with the ]]> scan instead of
                # crashing the row
                nm = _DECLNAME.match(html, lt + 3)
                name = nm.group().strip().lower() if nm else ""
                closer = (
                    _MS_MARKED_CLOSE
                    if name in ("if", "else", "endif")
                    else _MARKED_CLOSE
                )
                m = closer.search(html, lt + 3)
                if m:
                    pos = m.end()
                    continue
            elif html[lt + 2 : lt + 9].lower() == "doctype":
                gt = find(">", lt + 9)
                if gt >= 0:
                    pos = gt + 1
                    continue
            else:  # bogus comment: <!foo ...>
                gt = find(">", lt + 2)
                if gt >= 0:
                    pos = gt + 1
                    continue
            emit, pos = tolerant(lt)
            if emit is not None:
                chunk = html[emit:pos]
                if "&" in chunk:
                    chunk = unescape(chunk)
                yield 0, chunk
            continue
        if nxt == "?":
            gt = find(">", lt + 2)
            if gt >= 0:
                pos = gt + 1
            else:
                emit, pos = tolerant(lt)
                if emit is not None:
                    chunk = html[emit:pos]
                    if "&" in chunk:
                        chunk = unescape(chunk)
                    yield 0, chunk
            continue
        if nxt == "/":
            # parse_endtag
            gt = find(">", lt + 1)
            if gt < 0:
                emit, pos = tolerant(lt)
                if emit is not None:
                    chunk = html[emit:pos]
                    if "&" in chunk:
                        chunk = unescape(chunk)
                    yield 0, chunk
                continue
            m = _ENDTAGFIND.match(html, lt)
            if m:
                yield 2, m.group(1).lower()
                pos = gt + 1
                continue
            nm = _TAGFIND_TOL.match(html, lt + 2)
            if nm:
                yield 2, nm.group(1).lower()
                pos = find(">", nm.end()) + 1
            elif html.startswith("</>", lt):
                pos = lt + 3
            else:  # bogus comment, ignored
                pos = find(">", lt + 2) + 1
            continue
        m = _SIMPLE_START.match(html, lt)
        if m:
            tag = m.group(1).lower()
            yield 1, tag
            pos = m.end()
            if tag in _CDATA_ELEMS:
                m2 = _CDATA_CLOSE[tag].search(html, pos)
                if m2:
                    yield 2, tag
                    pos = m2.end()
                else:
                    pos = n
            continue
        m = _LOCATE_START.match(html, lt)
        if not m:
            # '<' not followed by a letter: literal data (goahead);
            # a lone trailing '<' is dropped like the stdlib's break
            if lt + 1 < n:
                yield 0, "<"
                pos = lt + 1
            else:
                pos = n
            continue
        tag = m.group(1).lower()
        j = m.end()
        after = html[j : j + 1]
        if after == ">":
            pos = j + 1
            kind = 1
            if "/" in m.group(0):
                # a '/' in the tag span may be XHTML self-closing
                # ('<br/>') or part of a bare attribute value
                # ('<a href=x/>', NOT self-closing); parse_starttag
                # decides via the attrfind walk — mirror it
                k = _TAGFIND_TOL.match(html, lt + 1).end()
                while k < pos:
                    am = _ATTRFIND_TOL.match(html, k)
                    if not am:
                        break
                    k = am.end()
                tail = html[k:pos].strip()
                if tail == "/>":
                    kind = 3
                elif tail != ">":
                    # out-of-sync junk: stdlib re-emits the raw tag
                    yield 0, html[lt:pos]
                    continue
            yield kind, tag
            if kind == 1 and tag in _CDATA_ELEMS:
                # CDATA mode: only a full '</tag>' close exits
                # (html.parser's set_cdata_mode interesting regex);
                # body text is never content (script/style)
                m2 = _CDATA_CLOSE[tag].search(html, pos)
                if m2:
                    yield 2, tag
                    pos = m2.end()
                else:
                    pos = n
        elif after == "/" and html.startswith("/>", j):
            yield 3, tag
            pos = j + 2
        elif after == "" or after in _INCOMPLETE_NEXT:
            # incomplete start tag (check_for_whole_start_tag -1)
            emit, pos = tolerant(lt)
            if emit is not None:
                chunk = html[emit:pos]
                if "&" in chunk:
                    chunk = unescape(chunk)
                yield 0, chunk
        else:
            # bogus input: parse_starttag re-emits the raw fragment
            # as data WITHOUT entity conversion
            yield 0, html[lt:j] if j > lt else "<"
            pos = j if j > lt else lt + 1


def segment_blocks(html: bytes | str, engine: str = "fast") -> list[Block]:
    """Tag-aware segmentation into text blocks with shallow features.

    ``engine="fast"`` (default) uses the single-scan tokenizer;
    ``engine="stdlib"`` keeps html.parser as the differential
    reference implementation.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        # charset cascade (BOM → meta prescan → UTF-8-else-1252):
        # crawl HTML is ~1/3 non-UTF-8 and a blind utf-8/replace
        # shreds it to U+FFFD before segmentation ever runs
        from pdf_parser_spark.html.charset import sniff_decode

        html, _codec = sniff_decode(html)
    p = _BlockParser()
    if engine == "stdlib":
        p.feed(html)
        p.close()
        return p.blocks
    data, start, end, startend = (
        p.handle_data,
        p.handle_starttag,
        p.handle_endtag,
        p.handle_startendtag,
    )
    for kind, value in _fast_events(html):
        if kind == 0:
            data(value)
        elif kind == 1:
            start(value, ())
        elif kind == 2:
            end(value)
        else:
            startend(value, ())
    p._flush()
    return p.blocks


def _classify(blocks: list[Block]) -> list[bool]:
    """Per-block content decision + one densitometric smoothing pass."""
    verdict: list[bool] = []
    for b in blocks:
        if b.in_boiler:
            verdict.append(False)
        elif b.link_density > _MAX_LINK_DENSITY:
            verdict.append(False)
        elif b.tag in _HEADINGS:
            # headings decided by their neighborhood in the smoothing pass
            verdict.append(b.n_words >= 3)
        else:
            verdict.append(b.n_words >= _MIN_WORDS_CONTENT)

    # smoothing: short clean blocks between/adjacent-to content are kept
    # (quantitative-linguistic fusion from the boilerpipe paper)
    n = len(blocks)
    smoothed = verdict[:]
    for i, b in enumerate(blocks):
        if smoothed[i] or b.in_boiler or b.link_density > _MAX_LINK_DENSITY:
            continue
        prev_ok = i > 0 and verdict[i - 1]
        next_ok = i + 1 < n and verdict[i + 1]
        if b.tag in _HEADINGS:
            smoothed[i] = next_ok
        elif b.n_words >= 3 and (prev_ok and next_ok):
            smoothed[i] = True
    return smoothed


def extract_html(html: bytes | str) -> tuple[str, list[tuple[int, int, str]]]:
    """Main text + char-offset spans ``(start, end, kind)`` where kind
    is ``heading`` or ``paragraph``.  Content blocks join with blank
    lines, mirroring the PDF txt renderer's shape."""
    blocks = segment_blocks(html)
    keep = _classify(blocks)
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for b, ok in zip(blocks, keep):
        if not ok:
            continue
        text = b.text
        kind = "heading" if b.tag in _HEADINGS else "paragraph"
        if parts:
            parts.append("\n\n")
            pos += 2
        spans.append((pos, pos + len(text), kind))
        parts.append(text)
        pos += len(text)
    out = "".join(parts)
    return (out + "\n" if out else out), spans
