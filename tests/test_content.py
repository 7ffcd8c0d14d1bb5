"""Ported content-parser tests (content/parser.rs:774-825) plus pins
on positioning and merge semantics."""

from pdf_parser_spark.engine.content import ContentParser, decode_default


def parse(content: bytes):
    return ContentParser(content).parse()


def test_simple_text():
    spans = parse(b"BT /F1 12 Tf 100 700 Td (Hello World) Tj ET")
    assert len(spans) == 1
    s = spans[0]
    assert (s.text, s.x, s.y, s.font_size) == ("Hello World", 100.0, 700.0, 12.0)


def test_multiple_spans():
    spans = parse(b"BT /F1 10 Tf 50 500 Td (First) Tj 0 -20 Td (Second) Tj ET")
    assert [s.text for s in spans] == ["First", "Second"]
    assert spans[1].y == 480.0


def test_tj_array():
    spans = parse(b"BT /F1 12 Tf 100 700 Td [(Hello) -100 (World)] TJ ET")
    assert len(spans) == 1
    assert spans[0].text == "HelloWorld"


def test_tj_array_with_large_gap():
    spans = parse(b"BT /F1 12 Tf 100 700 Td [(Hello) -2000 (World)] TJ ET")
    assert [s.text for s in spans] == ["Hello", "World"]


# -- additional pins --------------------------------------------------------


def test_tm_sets_absolute_position():
    spans = parse(b"BT /F1 12 Tf 1 0 0 1 200 300 Tm (At) Tj ET")
    assert spans[0].x == 200.0 and spans[0].y == 300.0


def test_tstar_uses_leading():
    spans = parse(b"BT /F1 12 Tf 14 TL 100 700 Td (a1) Tj T* (b2) Tj ET")
    assert spans[1].y == 686.0


def test_quote_operator():
    spans = parse(b"BT /F1 12 Tf 14 TL 100 700 Td (first line) Tj (second line) ' ET")
    assert [s.text for s in spans] == ["first line", "second line"]
    assert spans[1].y == 686.0


def test_double_quote_operator():
    spans = parse(b'BT /F1 12 Tf 14 TL 100 700 Td (one) Tj 3 1 (two) " ET')
    assert [s.text for s in spans] == ["one", "two"]
    assert spans[1].y == 686.0


def test_q_Q_state_stack():
    spans = parse(b"BT /F1 20 Tf q /F1 8 Tf 100 700 Td (small) Tj Q 1 0 0 1 100 600 Tm (big) Tj ET")
    by_text = {s.text: s for s in spans}
    assert by_text["small"].font_size == 8.0
    assert by_text["big"].font_size == 20.0


def test_whitespace_only_span_kept_as_space_marker():
    # (parser.rs:726-735) — needs a neighbor so the merge keeps a row
    spans = ContentParser(b"BT /F1 12 Tf 100 700 Td (  ) Tj ET").parse()
    assert len(spans) == 1 and spans[0].text == " "


def test_half_em_advance_is_per_byte():
    # advance = len(bytes) * size * 0.5 (parser.rs:698)
    p = ContentParser(b"BT /F1 10 Tf 0 0 Td (abcd) Tj ET")
    p.parse()
    # after parse the final text matrix x must be 4*10*0.5 = 20


def test_inline_dict_skipped():
    spans = parse(b"BT /F1 12 Tf 100 700 Td << /Junk true >> (ok) Tj ET")
    assert [s.text for s in spans] == ["ok"]


def test_stray_bracket_makes_progress():
    # the reference would loop forever here; we must terminate
    spans = parse(b"] BT /F1 12 Tf 100 700 Td (alive) Tj ET")
    assert [s.text for s in spans] == ["alive"]


def test_decode_default():
    assert decode_default(b"A\x01B") == "A B"
    assert decode_default(bytes([0xE9])) == "é"
    assert decode_default(bytes([0x7F])) == " "


def test_merge_same_line_word_gap():
    # two multi-char spans, gap ≈ 1 char width → space-joined (parser.rs:196-199)
    content = b"BT /F1 10 Tf 1 0 0 1 0 0 Tm (Hello) Tj 1 0 0 1 30 0 Tm (World) Tj ET"
    spans = parse(content)
    assert len(spans) == 1
    assert spans[0].text == "Hello World"


def test_merge_large_gap_keeps_columns():
    content = b"BT /F1 10 Tf 1 0 0 1 0 0 Tm (Left) Tj 1 0 0 1 300 0 Tm (Right) Tj ET"
    spans = parse(content)
    assert [s.text for s in spans] == ["Left", "Right"]


def test_adversarial_content_streams_parse_in_linear_time():
    """Crafted content streams (long digit/whitespace/junk runs) must
    not trigger quadratic regex backtracking in the tokenizer — the
    number core is atomic, whitespace prefixes cannot re-split, and
    every position has a catch-all alternative.  DoS hardening for
    hostile PDFs at crawl scale."""
    import time

    from pdf_parser_spark.engine.content import ContentParser

    cases = [
        b"9" * 300_000,
        (b"9" * 1000 + b" ") * 300,
        b"[" + b"(a) -1 " * 20000,
        b"1 2 3 4 5 " * 40000,
        b"%" + b"x" * 300_000,
        b"(" + b"a" * 300_000,
        b"<" + b"41" * 100_000,
        b"/" + b"N" * 300_000,
    ]
    for i, c in enumerate(cases):
        t0 = time.perf_counter()
        ContentParser(c).parse()
        assert time.perf_counter() - t0 < 5.0, i


# -- LINE-run batch + merge fast-path pins ----------------------------------


def test_line_run_batch_matches_generic_semantics():
    # a run of fused Tf/Tm/Tj lines must produce identical spans and
    # identical final state whether batched or stepped (a comment
    # between items forces the generic path for the tail)
    body = b" ".join(
        b"/F1 12 Tf 1 0 0 1 72 %d Tm (line %d) Tj" % (700 - 16 * i, i)
        for i in range(5)
    )
    batched = ContentParser(b"BT " + body + b" ET").parse()
    stepped = ContentParser(
        b"BT " + body.replace(b" /F1", b" % c\n/F1") + b" ET"
    ).parse()
    assert [(s.text, s.x, s.y, s.font_size, s.font_name) for s in batched] == [
        (s.text, s.x, s.y, s.font_size, s.font_name) for s in stepped
    ]


def test_line_run_final_state_feeds_following_operators():
    # state after a batched run must come from the LAST item: the
    # bare Tj afterwards emits at the advanced x of the last line
    # and the whole stream must equal the generic (comment-broken,
    # unbatchable) parse — including the T* leading and matrix a-d
    # values only the last run item should have set
    body = (
        b"/F1 10 Tf 1 0 0 1 50 700 Tm (aa) Tj"
        b" /F2 20 Tf 2 0 0 2 60 600 Tm (bbb) Tj (tail) Tj T* (next) Tj"
    )
    batched = ContentParser(b"BT " + body + b" ET").parse()
    stepped = ContentParser(
        b"BT " + body.replace(b" /F2", b" % c\n/F2") + b" ET"
    ).parse()
    assert [(s.text, s.x, s.y, s.font_size, s.font_name) for s in batched] == [
        (s.text, s.x, s.y, s.font_size, s.font_name) for s in stepped
    ]
    # the tail Tj landed at the advanced x of the LAST run item and
    # T* reused its line matrix — both merge back onto that line
    assert [s.text for s in batched] == ["aa", "bbb nexttail"]


def test_merge_fast_path_is_nan_safe():
    # 400-digit coordinates parse to +inf (same as the reference's f64
    # parse); inf - inf is NaN, which must NOT be treated as "already
    # line-separated" — the comparator then orders same-line spans by
    # x ascending, so the out-of-x-order input must come back sorted
    big = b"9" * 400
    spans = ContentParser(
        b"BT /F1 12 Tf 1 0 0 1 500 " + big + b" Tm (right) Tj"
        b" /F1 12 Tf 1 0 0 1 10 " + big + b" Tm (left) Tj ET"
    ).parse()
    assert [s.text for s in spans] == ["left right"] or [
        s.text for s in spans
    ] == ["left", "right"]
    # whatever the merge outcome, x-order must have been applied
    assert spans[0].x == 10.0


def test_merge_fast_path_boundary_exact_tolerance():
    # a y-gap EXACTLY equal to 0.3 x font_size is same-line for the
    # comparator (|dy| > tol is false) — must take the slow path and
    # merge/sort by x
    spans = ContentParser(
        b"BT /F1 10 Tf 1 0 0 1 300 100 Tm (b) Tj"
        b" /F1 10 Tf 1 0 0 1 10 97 Tm (a) Tj ET"
    ).parse()
    assert spans[0].x == 10.0


def test_line_run_rejects_class_matched_nonfloats():
    # the run-item regex's number class over-accepts strings float()
    # rejects ("1.2.3", "+-8"); such an item must fall back to the
    # generic loop UNCONSUMED, which then raises the reference's
    # invalid-number ParseError — identical to the never-batched path
    import pytest as _pytest

    from pdf_parser_spark.engine.errors import ParseError

    for bad in (b"1.2.3", b"+-8", b"5..4"):
        body = (
            b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (head) Tj "
            b"/F1 12 Tf 1 0 0 1 72 684 Tm (mid) Tj "
            b"/F1 12 Tf 1 0 0 " + bad + b" 72 668 Tm (tail) Tj ET"
        )
        with _pytest.raises(ParseError, match="Invalid number"):
            ContentParser(body).parse()
        with _pytest.raises(ParseError, match="Invalid number"):
            ContentParser(body.replace(b" /F1", b" % c\n/F1")).parse()


def test_line_batch_run_survives_float_rejecting_tail():
    """A run item whose size/matrix token matches the permissive
    number class but float-rejects must break to the generic loop
    WITHOUT clobbering the last successful item's state (once raised
    TypeError via a half-written batch)."""
    from pdf_parser_spark.engine.content import ContentParser

    s = (b"/F1 12 Tf 1 0 0 1 10 20 Tm (a) Tj "
         b"/F1 12 Tf 1 0 0 1 11 21 Tm (b) Tj "
         b"/F1 1-2 Tf 1 0 0 1 12 22 Tm (c) Tj")
    spans = ContentParser(s, {}).parse()
    # generic loop takes over: 1-2 lexes as 1 then -2, Tf size -2.0
    assert [(sp.text, sp.font_size) for sp in spans] == [
        ("c", -2.0),
        ("ab", 12.0),
    ]


def test_merge_fast_path_gates_on_both_font_sizes():
    """A big-font span following a small-font one within the big
    font's 0.3*fs y-tolerance must take the full sort+merge path (the
    comparator's tolerance is the LATER span's font size)."""
    from pdf_parser_spark.engine.content import ContentParser, TextSpan

    p = ContentParser(b"", {})
    p.spans = [
        TextSpan("x", 50.0, 100.0, 10.0, "F"),
        TextSpan("y", 0.0, 90.0, 40.0, "F"),
    ]
    out = p._merge_adjacent_spans()
    assert [(s.text, s.x, s.y) for s in out] == [("yx", 0.0, 90.0)]
