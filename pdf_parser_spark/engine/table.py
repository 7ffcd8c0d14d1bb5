"""Table reconstruction from span coordinates — the "group-by" of
this engine (reference: /root/reference/src/extract/table.rs).

Row clustering is a greedy 1-D pass over y-sorted spans with tolerance
``avg_font_size * 0.5`` anchored at each cluster's FIRST y (:115-149);
column detection pools all x positions and chains a fixed 10.0
tolerance against the last x ADDED to the cluster (:152-193 — subtly
different from layout.py's x-cluster counter, which chains against the
cluster START; keep them separate); cells take the nearest column by
``argmin |x - col|`` (:196-227).
"""

from __future__ import annotations

from operator import attrgetter

from pdf_parser_spark.engine.content import RUST_WS, TextSpan

_attr_x = attrgetter("x")
_attr_y = attrgetter("y")


class Table:
    __slots__ = ("rows", "num_columns")

    def __init__(self, rows: list[list[str]], num_columns: int):
        self.rows = rows
        self.num_columns = num_columns

    @classmethod
    def from_spans(cls, spans: list[TextSpan]) -> "Table":
        spans = [s for s in spans if s.text.strip(RUST_WS)]
        if not spans:
            return cls([], 0)

        avg_font_size = sum(s.font_size for s in spans) / len(spans)
        row_tolerance = avg_font_size * 0.5

        rows = cluster_into_rows(spans, row_tolerance)
        for row in rows:
            row.sort(key=lambda s: s.x)
        columns = detect_columns(rows)
        grid = assign_to_columns(rows, columns)
        return cls(grid, len(columns))

    def to_csv(self) -> str:
        return "\n".join(
            ",".join(escape_csv(cell) for cell in row) for row in self.rows
        )

    def to_tsv(self) -> str:
        return "\n".join(
            "\t".join(cell.replace("\t", " ") for cell in row) for row in self.rows
        )

    def to_text(self) -> str:
        """Aligned text: per-column max char width, cells joined by two
        spaces, each line right-trimmed (table.rs:79-111)."""
        if not self.rows:
            return ""
        widths = [0] * self.num_columns
        for row in self.rows:
            for i, cell in enumerate(row):
                if i < len(widths):
                    widths[i] = max(widths[i], len(cell))
        lines = []
        for row in self.rows:
            padded = [
                f"{cell:<{widths[i] if i < len(widths) else 0}}"
                for i, cell in enumerate(row)
            ]
            lines.append("  ".join(padded).rstrip(RUST_WS))
        return "\n".join(lines)


def cluster_into_rows(spans: list[TextSpan], tolerance: float) -> list[list[TextSpan]]:
    """Greedy y-clustering; the anchor is the first span's y of the
    current cluster, not a running mean (table.rs:115-149)."""
    # two stable passes == sort by (-y, x): y desc, ties x asc
    spans = sorted(spans, key=_attr_x)
    spans.sort(key=_attr_y, reverse=True)
    rows: list[list[TextSpan]] = []
    current: list[TextSpan] = []
    current_y: float | None = None
    for span in spans:
        if current_y is not None and abs(span.y - current_y) <= tolerance:
            current.append(span)
        else:
            if current:
                rows.append(current)
            current_y = span.y
            current = [span]
    if current:
        rows.append(current)
    return rows


def detect_columns(rows: list[list[TextSpan]]) -> list[float]:
    """Pool ALL x positions, chain tolerance 10.0 against the last x
    appended; column position is the cluster mean (table.rs:152-193)."""
    xs = sorted(s.x for row in rows for s in row)
    if not xs:
        return []
    tolerance = 10.0
    columns: list[float] = []
    cluster: list[float] = []
    for x in xs:
        if not cluster:
            cluster.append(x)
        elif abs(x - cluster[-1]) <= tolerance:
            cluster.append(x)
        else:
            columns.append(sum(cluster) / len(cluster))
            cluster = [x]
    if cluster:
        columns.append(sum(cluster) / len(cluster))
    return columns


def assign_to_columns(rows: list[list[TextSpan]], columns: list[float]) -> list[list[str]]:
    """Nearest-column assignment; multiple spans in a cell join with a
    space (table.rs:196-227).  Rust's ``Iterator::min_by`` keeps the
    FIRST minimal element on ties (only max_by keeps the last), and so
    does Python's ``min`` — an equidistant span goes to the LEFT
    column on both engines."""
    num_cols = len(columns)
    grid = []
    for row in rows:
        cells = [""] * num_cols
        for span in row:
            col_idx = min(
                range(num_cols), key=lambda i: abs(span.x - columns[i])
            )
            if cells[col_idx]:
                cells[col_idx] += " "
            cells[col_idx] += span.text
        grid.append(cells)
    return grid


def escape_csv(s: str) -> str:
    """Quote when the cell contains ``, " \\n \\r``; double embedded
    quotes (table.rs:230-236)."""
    if any(c in s for c in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s
