"""Output renderers (reference: /root/reference/src/extract/txt.rs,
markdown.rs).

These are the byte-identity targets: elements joined with blank lines,
trailing whitespace trimmed, final newline appended when nonempty
(txt.rs:4-31); markdown headings ``#``-prefixed, pipe tables padded to
per-column width with a ``---`` separator row and ``\\|`` escaping
(markdown.rs:5-97).
"""

from __future__ import annotations

from pdf_parser_spark.engine.content import RUST_WS
from pdf_parser_spark.engine.layout import HEADING, PARAGRAPH, TABLE, PageElement
from pdf_parser_spark.engine.table import Table


def elements_to_txt(elements: list[PageElement]) -> str:
    out = []
    for el in elements:
        if el.kind in (HEADING, PARAGRAPH):
            out.append(el.text)
            out.append("\n\n")
        elif el.kind == TABLE:
            out.append(el.table.to_text())
            out.append("\n\n")
    trimmed = "".join(out).rstrip(RUST_WS)
    return trimmed + "\n" if trimmed else trimmed


def elements_to_markdown(elements: list[PageElement]) -> str:
    out = []
    for el in elements:
        if el.kind == HEADING:
            out.append("#" * el.level)
            out.append(" ")
            out.append(el.text)
            out.append("\n\n")
        elif el.kind == PARAGRAPH:
            out.append(el.text)
            out.append("\n\n")
        elif el.kind == TABLE:
            out.append(table_to_markdown(el.table))
            out.append("\n\n")
    trimmed = "".join(out).rstrip(RUST_WS)
    return trimmed + "\n" if trimmed else trimmed


def table_to_markdown(table: Table) -> str:
    if not table.rows:
        return ""
    # column widths: minimum 3 (the "---"), measured on escaped cells
    widths = [3] * table.num_columns
    for row in table.rows:
        for i, cell in enumerate(row):
            if i < len(widths):
                widths[i] = max(widths[i], len(escape_pipe(cell)))

    lines = [format_md_row(table.rows[0], widths)]
    sep = "|"
    for w in widths:
        sep += " " + "-" * w + " |"
    lines.append(sep)
    for row in table.rows[1:]:
        lines.append(format_md_row(row, widths))
    # trailing newline removed; caller adds spacing (markdown.rs:76-77)
    return "\n".join(lines)


def format_md_row(row: list[str], widths: list[int]) -> str:
    out = "|"
    for i, cell in enumerate(row):
        width = widths[i] if i < len(widths) else 3
        out += f" {escape_pipe(cell):<{width}} |"
    for i in range(len(row), len(widths)):
        out += f" {'':<{widths[i]}} |"
    return out


def escape_pipe(s: str) -> str:
    return s.replace("|", "\\|")
