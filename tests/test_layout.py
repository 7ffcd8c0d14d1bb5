"""Ported layout tests (extract/layout.rs:250-364)."""

from pdf_parser_spark.engine.content import TextSpan
from pdf_parser_spark.engine.layout import (
    HEADING,
    PARAGRAPH,
    TABLE,
    classify_spans,
    compute_body_font_size,
    count_x_clusters,
)


def span(text, x, y, size):
    return TextSpan(text, x, y, size, None)


def test_heading_detection():
    els = classify_spans([
        span("Title", 50.0, 700.0, 24.0),
        span("Normal text here.", 50.0, 670.0, 12.0),
    ])
    assert len(els) == 2
    assert els[0].kind == HEADING and els[0].level == 1 and els[0].text == "Title"
    assert els[1].kind == PARAGRAPH and els[1].text == "Normal text here."


def test_table_detection():
    els = classify_spans([
        span("A", 50.0, 500.0, 12.0), span("B", 200.0, 500.0, 12.0),
        span("C", 350.0, 500.0, 12.0),
        span("1", 50.0, 480.0, 12.0), span("2", 200.0, 480.0, 12.0),
        span("3", 350.0, 480.0, 12.0),
    ])
    assert len(els) == 1
    assert els[0].kind == TABLE


def test_paragraph_merging():
    els = classify_spans([
        span("First line of text", 50.0, 500.0, 12.0),
        span("second line of text", 50.0, 486.0, 12.0),
        span("third line of text", 50.0, 472.0, 12.0),
    ])
    assert len(els) == 1
    assert els[0].kind == PARAGRAPH
    assert "First line" in els[0].text and "third line" in els[0].text


def test_mixed_content():
    els = classify_spans([
        span("Document Title", 50.0, 750.0, 24.0),
        span("Some introductory text.", 50.0, 710.0, 12.0),
        span("Name", 50.0, 680.0, 12.0), span("Age", 200.0, 680.0, 12.0),
        span("City", 350.0, 680.0, 12.0),
        span("Alice", 50.0, 660.0, 12.0), span("30", 200.0, 660.0, 12.0),
        span("NYC", 350.0, 660.0, 12.0),
    ])
    assert len(els) >= 3
    assert els[0].kind == HEADING
    assert els[1].kind == PARAGRAPH
    assert els[2].kind == TABLE


def test_empty_spans():
    assert classify_spans([]) == []


def test_body_font_size_detection():
    lines = [
        [span("Big Title", 50.0, 700.0, 24.0)],
        [span("Normal text line one that is quite long.", 50.0, 670.0, 12.0)],
        [span("Normal text line two also fairly long.", 50.0, 655.0, 12.0)],
        [span("Normal text line three.", 50.0, 640.0, 12.0)],
    ]
    assert abs(compute_body_font_size(lines) - 12.0) < 0.5


def test_x_cluster_counting():
    spans = [
        span("A", 50.0, 500.0, 12.0),
        span("B", 52.0, 500.0, 12.0),  # same cluster as A
        span("C", 200.0, 500.0, 12.0),
        span("D", 350.0, 500.0, 12.0),
    ]
    assert count_x_clusters(spans) == 3


# -- additional pins --------------------------------------------------------


def test_x_cluster_chains_against_cluster_start():
    # 0, 8, 16: 16 is within 10 of 8 but NOT of cluster start 0 —
    # layout counts clusters against the START (layout.rs:125-129),
    # so 16 begins a new cluster → 2
    spans = [span("a", 0.0, 10.0, 12.0), span("b", 8.0, 10.0, 12.0),
             span("c", 16.0, 10.0, 12.0)]
    assert count_x_clusters(spans) == 2


def test_single_table_candidate_demoted():
    # one 3-cluster line (not 4) → paragraph (layout.rs:211-220)
    els = classify_spans([
        span("a", 50.0, 500.0, 12.0), span("b", 200.0, 500.0, 12.0),
        span("c", 350.0, 500.0, 12.0),
        span("just some prose words here", 50.0, 480.0, 12.0),
    ])
    assert all(e.kind == PARAGRAPH for e in els)


def test_single_candidate_with_4_clusters_is_table():
    els = classify_spans([
        span("a", 50.0, 500.0, 12.0), span("b", 200.0, 500.0, 12.0),
        span("c", 350.0, 500.0, 12.0), span("d", 500.0, 500.0, 12.0),
        span("plain paragraph body text", 50.0, 480.0, 12.0),
    ])
    assert els[0].kind == TABLE


def test_paragraph_break_on_large_gap():
    els = classify_spans([
        span("para one line", 50.0, 500.0, 12.0),
        span("para two after gap", 50.0, 450.0, 12.0),  # gap 50 > 18
    ])
    assert len(els) == 2


def test_tied_body_font_larger_key_wins():
    # equal char weight at 10pt and 12pt → 12 (Rust max_by_key keeps last)
    lines = [[span("aaaa", 0.0, 100.0, 10.0)], [span("bbbb", 0.0, 80.0, 12.0)]]
    assert compute_body_font_size(lines) == 12.0


def test_body_font_size_saturates_like_rust_cast():
    """A 400-digit Tf size parses to +inf; the 0.5pt quantization must
    saturate like Rust's `as i32`, not raise OverflowError."""
    from pdf_parser_spark.engine.content import TextSpan
    from pdf_parser_spark.engine.layout import compute_body_font_size

    inf = float("inf")
    lines = [[TextSpan("Hi", 10.0, 700.0, inf, "F1")]]
    assert compute_body_font_size(lines) == (2**31 - 1) / 2.0
    nan = float("nan")
    lines = [[TextSpan("Hi", 10.0, 700.0, nan, "F1")]]
    assert compute_body_font_size(lines) == 0.0


def test_uniform_fast_path_matches_full_pipeline():
    """The O(n) uniform-font fast path (layout.py _classify_uniform_fast)
    must be output-identical to the full clustering pipeline whenever it
    engages — randomized differential over uniform/mixed fonts, shuffled
    orders, whitespace-only spans, tiny/negative/NaN sizes."""
    import random

    from pdf_parser_spark.engine.layout import (
        _classify_full,
        _classify_uniform_fast,
    )

    def norm(els):
        return [
            (
                e.kind,
                e.level,
                e.text,
                None if e.table is None else [
                    [c for c in row] for row in e.table.rows
                ],
            )
            for e in els
        ]

    rng = random.Random(1234)
    engaged = 0
    for _ in range(2500):
        n = rng.randint(0, 12)
        uniform = rng.random() < 0.5
        fs0 = rng.choice([12.0, 8.5, 0.7, 24.0, 0.2, float("nan")])
        spans, y = [], 700.0
        for _i in range(n):
            fs = fs0 if uniform else rng.choice([12.0, 14.0, 24.0, 6.0])
            y -= rng.choice([3.0, 7.0, 16.0, 30.0, 0.0])
            x = rng.choice([72.0, 85.0, 200.0, 350.0, 470.0])
            t = rng.choice(["hello world", " ", "", "A", "  padded  "])
            spans.append(span(t, x, y, fs))
        if rng.random() < 0.2:
            rng.shuffle(spans)
        fast = _classify_uniform_fast(spans)
        if fast is None:
            continue
        engaged += 1
        assert norm(fast) == norm(_classify_full(spans))
    assert engaged > 200  # the fast path must actually engage
