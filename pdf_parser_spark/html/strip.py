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
    __slots__ = ("text_parts", "link_chars", "tag", "in_boiler", "depth")

    def __init__(self, tag: str, in_boiler: bool, depth: int):
        self.text_parts: list[str] = []
        self.link_chars = 0
        self.tag = tag
        self.in_boiler = in_boiler
        self.depth = depth

    @property
    def text(self) -> str:
        return " ".join(" ".join(self.text_parts).split())

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def n_words(self) -> int:
        return len(self.text.split())

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
        if self._ignore_depth or not data.strip():
            return
        if self._current is None:
            self._current = Block("p", self._boiler_depth > 0, len(self._tag_stack))
        self._current.text_parts.append(data)
        if self._link_depth:
            self._current.link_chars += len(" ".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def segment_blocks(html: bytes | str) -> list[Block]:
    """Tag-aware segmentation into text blocks with shallow features."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _BlockParser()
    p.feed(html)
    p.close()
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
