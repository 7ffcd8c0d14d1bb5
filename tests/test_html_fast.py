"""Differential equivalence of the fast single-scan HTML tokenizer vs
the stdlib html.parser reference path (segment_blocks engines)."""

import pytest

from fixtures.gen import build_html_corpus
from pdf_parser_spark.html.strip import extract_html, segment_blocks

ADVERSARIAL = [
    # entities joined mid-word must not split tokens
    b"<p>foo&amp;bar stays one word of ten tokens a b c d e f g</p>",
    b"<p>a&lt;b &gt; c &#65; &#x41; &nbsp;x</p>",
    # comments split data runs
    b"<p>foo<!-- hidden <p>not a tag</p> -->bar baz</p>",
    # doctype / processing instruction / CDATA-ish declarations
    b"<!DOCTYPE html><?xml version='1.0'?><p>body text here now ok</p>",
    # quoted '>' inside attribute values
    b'<p><a href="x>y" title=\'a>b\'>link text</a> tail words</p>',
    # self-closing and void tags
    b"<p>one two</p><br/><hr /><p>three four</p><br><p>five</p>",
    # raw-text elements swallow markup-looking content
    b"<script>var x = '<p>not text</p>';</script><p>real words</p>",
    b"<style>p::before { content: '</ '; }</style><p>visible</p>",
    b"<textarea><p>ignored</p></textarea><p>kept words</p>",
    # fake close inside rawtext (</scriptx is not a close)
    b"<script>a = '</scriptx>'; b = 1;</script><p>after script</p>",
    # uppercase tags, nested boilerplate sections
    b"<NAV>menu</NAV><P>Main CONTENT words</P><FOOTER>foot</FOOTER>",
    # bare '<' that is not a tag
    b"<p>3 < 5 and 7 > 2 in math</p>",
    # table-ish structure
    b"<table><tr><td>cell one</td><td>cell two</td></tr></table>",
]


def _sig(blocks):
    return [(b.tag, b.in_boiler, b.depth, b.text, b.link_chars) for b in blocks]


@pytest.mark.parametrize("doc", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_fast_matches_stdlib_adversarial(doc):
    assert _sig(segment_blocks(doc, engine="fast")) == _sig(
        segment_blocks(doc, engine="stdlib")
    )


def test_unterminated_tag_at_eof_dropped():
    # DELIBERATE divergence from stdlib: html.parser leaks an
    # unterminated trailing tag into the text ("< a href="); the fast
    # tokenizer drops the fragment — the right call for extraction.
    blocks = segment_blocks(b"<p>words before a broken <a href=", engine="fast")
    assert [(b.tag, b.text) for b in blocks] == [("p", "words before a broken")]


@pytest.mark.parametrize("cid", sorted(build_html_corpus()))
def test_fast_matches_stdlib_corpus(cid):
    doc = build_html_corpus()[cid]
    assert _sig(segment_blocks(doc, engine="fast")) == _sig(
        segment_blocks(doc, engine="stdlib")
    )


def test_extract_html_uses_fast_path_identically():
    for doc in build_html_corpus().values():
        text, spans = extract_html(doc)
        blocks = segment_blocks(doc, engine="stdlib")
        # re-render through the stdlib blocks to pin equality
        from pdf_parser_spark.html.strip import _classify

        keep = _classify(blocks)
        parts, pos, expect_spans = [], 0, []
        for b, ok in zip(blocks, keep):
            if not ok:
                continue
            kind = "heading" if b.tag in {"h1", "h2", "h3", "h4", "h5", "h6"} else "paragraph"
            if parts:
                parts.append("\n\n")
                pos += 2
            expect_spans.append((pos, pos + len(b.text), kind))
            parts.append(b.text)
            pos += len(b.text)
        out = "".join(parts)
        assert text == (out + "\n" if out else out)
        assert spans == expect_spans
