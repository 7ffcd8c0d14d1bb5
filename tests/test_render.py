"""Ported renderer tests (extract/txt.rs:33-75, markdown.rs:99-190)."""

from pdf_parser_spark.engine.layout import HEADING, PARAGRAPH, TABLE, PageElement
from pdf_parser_spark.engine.render import (
    elements_to_markdown,
    elements_to_txt,
    escape_pipe,
)
from pdf_parser_spark.engine.table import Table


def H(level, text):
    return PageElement(HEADING, level=level, text=text)


def P(text):
    return PageElement(PARAGRAPH, text=text)


def T(rows, ncols):
    return PageElement(TABLE, table=Table(rows=rows, num_columns=ncols))


def test_heading_and_paragraph():
    assert (
        elements_to_txt([H(1, "Hello World"), P("This is a paragraph.")])
        == "Hello World\n\nThis is a paragraph.\n"
    )


def test_table_element():
    txt = elements_to_txt([T([["A", "B"], ["1", "2"]], 2)])
    assert "A" in txt and "B" in txt


def test_empty_elements():
    assert elements_to_txt([]) == ""


def test_heading_levels():
    md = elements_to_markdown([H(1, "Title"), H(2, "Subtitle"), H(3, "Section")])
    assert "# Title" in md
    assert "## Subtitle" in md
    assert "### Section" in md


def test_paragraph_md():
    assert elements_to_markdown([P("Hello world.")]) == "Hello world.\n"


def test_markdown_table():
    md = elements_to_markdown([T([["Name", "Age"], ["Alice", "30"]], 2)])
    assert "| Name" in md
    assert "| ---" in md
    assert "| Alice" in md


def test_pipe_escaping():
    assert escape_pipe("a|b") == "a\\|b"
    assert escape_pipe("normal") == "normal"


def test_empty_md():
    assert elements_to_markdown([]) == ""


def test_mixed_content_markdown():
    md = elements_to_markdown([
        H(1, "Report"),
        P("Summary of data."),
        T([["Col1", "Col2"], ["A", "B"]], 2),
    ])
    assert md.startswith("# Report")
    assert "Summary of data." in md
    assert "| Col1" in md


# -- additional pins --------------------------------------------------------


def test_markdown_table_exact_layout():
    md = elements_to_markdown([T([["Name", "Age"], ["Alice", "30"]], 2)])
    assert md == (
        "| Name  | Age |\n"
        "| ----- | --- |\n"
        "| Alice | 30  |\n"
    )


def test_markdown_min_width_three():
    md = elements_to_markdown([T([["a", "b"], ["c", "d"]], 2)])
    assert md == "| a   | b   |\n| --- | --- |\n| c   | d   |\n"


def test_markdown_short_row_padded():
    md = elements_to_markdown([T([["aa", "bb"], ["c"]], 2)])
    assert "| c   |     |" in md
