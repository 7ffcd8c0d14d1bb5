"""Layout classification: headings / paragraphs / tables.

Reimplements /root/reference/src/extract/layout.rs: greedy y-line
clustering (:59-90), char-count-weighted body-font mode over 0.5 pt
quantized sizes (:93-110), x-cluster counting chained against the
cluster START (:113-133 — deliberately different from table.py's
detect_columns, which chains against the last ADDED x), the
ratio/x-cluster line classifier (:136-178) and the element merger
(:181-248: ≥2 consecutive table candidates pool into one table, a
single candidate needs ≥4 x-clusters, paragraphs join with spaces and
break at y-gaps > 1.5 × body size).
"""

from __future__ import annotations

import math
from operator import attrgetter

from pdf_parser_spark.engine.content import RUST_WS, TextSpan
from pdf_parser_spark.engine.table import Table, cluster_into_rows

_attr_x = attrgetter("x")

HEADING = "heading"
PARAGRAPH = "paragraph"
TABLE = "table"


class PageElement:
    """kind ∈ {heading, paragraph, table}; mirrors layout.rs:6-10."""

    __slots__ = ("kind", "level", "text", "table")

    def __init__(self, kind: str, *, level: int = 0, text: str = "", table: Table | None = None):
        self.kind = kind
        self.level = level
        self.text = text
        self.table = table

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.kind == TABLE:
            return f"PageElement(table, {len(self.table.rows)} rows)"
        return f"PageElement({self.kind}{self.level or ''}, {self.text!r})"


# classified lines travel as plain tuples (kind, level, spans, y,
# text) — attribute objects measurably dominate 60-page documents
_TABLE_CANDIDATE = "table_candidate"


def classify_spans(spans: list[TextSpan]) -> list[PageElement]:
    """Whole-page classification pipeline (layout.rs:13-41)."""
    fast = _classify_uniform_fast(spans)
    if fast is not None:
        return fast
    return _classify_full(spans)


def _classify_full(spans: list[TextSpan]) -> list[PageElement]:
    spans = [s for s in spans if s.text.strip(RUST_WS)]
    if not spans:
        return []
    avg_font_size = sum(s.font_size for s in spans) / len(spans)
    row_tolerance = avg_font_size * 0.5
    lines = cluster_into_rows(spans, row_tolerance)
    body_font_size = compute_body_font_size(lines)
    classified = [_classify_line(line, body_font_size) for line in lines]
    return _merge_lines(classified, body_font_size)


def _classify_uniform_fast(spans: list[TextSpan]) -> list[PageElement] | None:
    """O(n) single-pass fast path for the overwhelmingly common page
    shape: ONE positive font size everywhere and spans already in
    strictly descending y order with inter-line gaps above the row
    tolerance (i.e. one span per visual line, reading order).

    Under those preconditions the full pipeline's result is forced:
    every row is a singleton (greedy clustering can never join two
    spans whose gap exceeds the tolerance), the body font is the one
    quantized size (the mode over a single key), the heading ratio is
    fs/quant(fs) — checked < 1.3 here, else fall back — and a single
    span per line means one x-cluster, so every line classifies as a
    paragraph and only the 1.5 × body y-gap paragraph-break rule
    remains.  Any precondition failure returns None and the caller
    runs the full (semantics-defining) pipeline; equivalence is pinned
    by the differential test in tests/test_layout.py.
    """
    if not spans:
        return []
    fs = spans[0].font_size
    if not (fs > 0.0):
        return None
    tol = fs * 0.5
    body = _as_i32(_rust_round(fs * 2.0)) / 2.0
    if body <= 0.0 or fs / body >= 1.3:
        return None
    texts: list[str] = []
    ys: list[float] = []
    prev_y = None
    for s in spans:
        if s.font_size != fs:
            return None
        t = s.text.strip(RUST_WS)
        if not t:
            continue  # whitespace-only spans are filtered pre-clustering
        y = s.y
        if prev_y is not None and not (prev_y - y > tol):
            return None
        prev_y = y
        texts.append(t)
        ys.append(y)
    if not texts:
        return []
    gap = body * 1.5
    elements: list[PageElement] = []
    parts = [texts[0]]
    prev_y = ys[0]
    for i in range(1, len(texts)):
        ly = ys[i]
        if abs(prev_y - ly) > gap:
            elements.append(PageElement(PARAGRAPH, text=" ".join(parts)))
            parts = [texts[i]]
        else:
            parts.append(texts[i])
        prev_y = ly
    elements.append(PageElement(PARAGRAPH, text=" ".join(parts)))
    return elements


def _rust_round(x: float) -> float:
    """f64::round — half away from zero (Python's round() is
    banker's rounding, which would misquantize *.25 sizes).  NaN/±inf
    pass through like f64::round (math.floor would raise)."""
    if not math.isfinite(x):
        return x
    return math.copysign(math.floor(abs(x) + 0.5), x)


_I32_MIN, _I32_MAX = -(2**31), 2**31 - 1


def _as_i32(x: float) -> int:
    """Rust's saturating ``as i32`` float cast: NaN → 0, ±inf and
    out-of-range saturate (a 400-digit Tf size must quantize like the
    reference, not raise OverflowError into the Spark task)."""
    if x != x:
        return 0
    if x >= _I32_MAX:
        return _I32_MAX
    if x <= _I32_MIN:
        return _I32_MIN
    return int(x)


def compute_body_font_size(lines: list[list[TextSpan]]) -> float:
    """Mode of 0.5 pt-quantized sizes weighted by char count; on tied
    counts the LARGEST key wins (Rust max_by_key over ascending
    BTreeMap keys returns the last maximum, layout.rs:93-110)."""
    freq: dict[int, int] = {}
    keys: dict[float, int] = {}  # font sizes repeat; cache the rounding
    get_key = keys.get
    get_freq = freq.get
    for line in lines:
        for span in line:
            fs = span.font_size
            key = get_key(fs)
            if key is None:
                key = keys[fs] = _as_i32(_rust_round(fs * 2.0))
            freq[key] = get_freq(key, 0) + len(span.text)
    if not freq:
        return 12.0
    best_key, best_count = None, -1
    for key in sorted(freq):
        if freq[key] >= best_count:
            best_key, best_count = key, freq[key]
    return best_key / 2.0


def count_x_clusters(spans: list[TextSpan]) -> int:
    """Gaps > 10.0 between sorted x's, chained against the cluster
    START (layout.rs:113-133)."""
    if not spans:
        return 0
    xs = sorted(s.x for s in spans)
    clusters = 1
    last_x = xs[0]
    for x in xs[1:]:
        if abs(x - last_x) > 10.0:
            clusters += 1
            last_x = x
    return clusters


def _classify_line(spans: list[TextSpan], body_font_size: float):
    if len(spans) == 1:  # the common case after span merging
        s = spans[0]
        y = s.y
        # the generic max-fold starts at 0.0, so a (pathological)
        # negative font size clamps to 0.0 — keep that
        max_font_size = s.font_size if s.font_size > 0.0 else 0.0
        x_clusters = 1
        text = s.text.strip(RUST_WS)
    else:
        spans = sorted(spans, key=_attr_x)
        y = sum(s.y for s in spans) / len(spans)
        max_font_size = 0.0
        for s in spans:
            if s.font_size > max_font_size:
                max_font_size = s.font_size
        x_clusters = count_x_clusters(spans)
        text = " ".join(s.text.strip(RUST_WS) for s in spans)

    ratio = max_font_size / body_font_size if body_font_size > 0.0 else 1.0

    if ratio >= 1.3 and x_clusters <= 2:
        level = 1 if ratio >= 1.8 else (2 if ratio >= 1.4 else 3)
        kind = HEADING
    elif x_clusters >= 3:
        kind, level = _TABLE_CANDIDATE, 0
    else:
        kind, level = PARAGRAPH, 0
    return (kind, level, spans, y, text)


def _merge_lines(lines: list[tuple], body_font_size: float) -> list[PageElement]:
    elements: list[PageElement] = []
    i = 0
    n = len(lines)
    while i < n:
        kind, level, spans, y, text = lines[i]
        if kind == HEADING:
            elements.append(PageElement(HEADING, level=level, text=text))
            i += 1
        elif kind == _TABLE_CANDIDATE:
            start = i
            while i < n and lines[i][0] == _TABLE_CANDIDATE:
                i += 1
            count = i - start
            if count >= 2:
                all_spans = [s for l in lines[start:i] for s in l[2]]
                elements.append(PageElement(TABLE, table=Table.from_spans(all_spans)))
            else:
                # a lone candidate needs ≥4 x-clusters, else it's prose
                # (layout.rs:211-220)
                if count_x_clusters(lines[start][2]) >= 4:
                    elements.append(
                        PageElement(TABLE, table=Table.from_spans(list(lines[start][2])))
                    )
                else:
                    elements.append(PageElement(PARAGRAPH, text=lines[start][4]))
        else:  # paragraph run
            parts: list[str] = []
            prev_y = y
            while i < n and lines[i][0] == PARAGRAPH:
                ly = lines[i][3]
                if parts and abs(prev_y - ly) > body_font_size * 1.5:
                    break
                parts.append(lines[i][4])
                prev_y = ly
                i += 1
            text = " ".join(parts)
            if text.strip(RUST_WS):
                elements.append(PageElement(PARAGRAPH, text=text))
    return elements
