"""Ported table tests (extract/table.rs:238-315)."""

from pdf_parser_spark.engine.content import TextSpan
from pdf_parser_spark.engine.table import Table, cluster_into_rows, detect_columns


def span(text, x, y, size=12.0):
    return TextSpan(text, x, y, size, None)


def test_simple_table():
    t = Table.from_spans([
        span("A", 0.0, 100.0), span("B", 50.0, 100.0),
        span("1", 0.0, 80.0), span("2", 50.0, 80.0),
    ])
    assert t.num_columns == 2
    assert t.rows == [["A", "B"], ["1", "2"]]


def test_csv_output():
    t = Table.from_spans([
        span("Name", 0.0, 100.0), span("Value", 50.0, 100.0),
        span("Test, Item", 0.0, 80.0), span("123", 50.0, 80.0),
    ])
    csv = t.to_csv()
    assert "Name,Value" in csv
    assert '"Test, Item",123' in csv


def test_row_clustering():
    rows = cluster_into_rows(
        [span("A", 0.0, 100.0), span("B", 50.0, 100.5), span("C", 0.0, 80.0)],
        6.0,
    )
    assert len(rows) == 2
    assert len(rows[0]) == 2
    assert len(rows[1]) == 1


def test_tsv_output():
    t = Table.from_spans([
        span("Col1", 0.0, 100.0), span("Col2", 50.0, 100.0),
        span("Data1", 0.0, 80.0), span("Data2", 50.0, 80.0),
    ])
    tsv = t.to_tsv()
    assert "Col1\tCol2" in tsv
    assert "Data1\tData2" in tsv


# -- additional pins --------------------------------------------------------


def test_aligned_text_padding():
    t = Table.from_spans([
        span("ab", 0.0, 100.0), span("c", 50.0, 100.0),
        span("x", 0.0, 80.0), span("long", 50.0, 80.0),
    ])
    # widths: col0=2, col1=4; joined by two spaces, right-trimmed
    assert t.to_text() == "ab  c\nx   long"


def test_detect_columns_chained_tolerance():
    # x positions 0,8,16,24 chain within 10 of the LAST ADDED → one col
    rows = [[span("a", 0.0, 10.0), span("b", 8.0, 10.0),
             span("c", 16.0, 10.0), span("d", 24.0, 10.0)]]
    assert detect_columns(rows) == [12.0]


def test_multiple_spans_one_cell_joined():
    t = Table.from_spans([
        span("hello", 0.0, 100.0), span("world", 4.0, 100.0),
        span("x", 200.0, 100.0),
        span("a", 0.0, 80.0), span("b", 200.0, 80.0),
    ])
    assert t.rows[0][0] == "hello world"


def test_empty_spans_filtered():
    t = Table.from_spans([span("  ", 0.0, 100.0)])
    assert t.rows == [] and t.num_columns == 0


def test_csv_quote_doubling():
    t = Table(rows=[['say "hi"', "b"]], num_columns=2)
    assert t.to_csv() == '"say ""hi""",b'


def test_equidistant_span_goes_to_first_column():
    """Rust's Iterator::min_by keeps the FIRST minimal element on
    ties — an equidistant span lands in the LEFT column."""
    from pdf_parser_spark.engine.content import TextSpan
    from pdf_parser_spark.engine.table import assign_to_columns

    rows = [[TextSpan("T", 10.0, 700.0, 10.0, "F")]]
    grid = assign_to_columns(rows, [0.0, 20.0])
    assert grid == [["T", ""]]
