"""Document-level entry points.

``pdf_to_text`` reproduces the reference's flagship function
(/root/reference/src/lib.rs:21-37) — THE byte-identity target; the
markdown/csv variants mirror lib.rs:40-75 and the tsv/aligned/raw
formats mirror the CLI branches (main.rs:116-143).

:func:`extract_document` is the Spark-row semantic: magic-byte
dispatch (``%PDF-`` → PDF path, else HTML boilerplate strip), errors
captured as row-level values (never raised — a 10^12-doc job must not
die on one malformed document), char-offset spans over the rendered
text, per-document page and element counts for lineage.
"""

from __future__ import annotations

from pdf_parser_spark.engine.content import RUST_WS
from pdf_parser_spark.engine.document import Document, simple_text_from_spans
from pdf_parser_spark.engine.errors import PdfError
from pdf_parser_spark.engine.layout import HEADING, PARAGRAPH, TABLE, classify_spans
from pdf_parser_spark.engine.render import elements_to_markdown, elements_to_txt
from pdf_parser_spark.engine.table import Table


def pdf_to_text(data: bytes, extended: bool = False) -> str:
    """Layout-aware plain text; pages joined with '\\n' (lib.rs:21-37)."""
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        spans = doc.extract_page_text(page_idx)
        elements = classify_spans(spans)
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n")
        out.append(elements_to_txt(elements))
    return "".join(out)


def pdf_to_markdown(data: bytes, extended: bool = False) -> str:
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        spans = doc.extract_page_text(page_idx)
        elements = classify_spans(spans)
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n")
        out.append(elements_to_markdown(elements))
    return "".join(out)


def pdf_to_csv(data: bytes, extended: bool = False) -> str:
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        spans = doc.extract_page_text(page_idx)
        table = Table.from_spans(spans)
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n")
        out.append(table.to_csv())
    return "".join(out)


def pdf_to_tsv(data: bytes, extended: bool = False) -> str:
    """CLI ``--tsv`` applied to every page, '\\n'-joined (main.rs:139)."""
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        table = Table.from_spans(doc.extract_page_text(page_idx))
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n")
        out.append(table.to_tsv())
    return "".join(out)


def pdf_to_aligned_text(data: bytes, extended: bool = False) -> str:
    """CLI ``--text`` (main.rs:140)."""
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        table = Table.from_spans(doc.extract_page_text(page_idx))
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n")
        out.append(table.to_text())
    return "".join(out)


def _fmt_f64(x: float) -> str:
    """Rust f64 Display: shortest round-trip repr, integral values
    without '.0'."""
    s = repr(x)
    return s[:-2] if s.endswith(".0") else s


def pdf_to_raw_spans(data: bytes, extended: bool = False) -> str:
    """CLI ``--raw`` debug format ``[x, y] (sizept): text``
    (main.rs:106-115) — including the reference's literal,
    un-interpolated ``--- Page {} ---`` separator."""
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        spans = doc.extract_page_text(page_idx)
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n--- Page {} ---\n")
        for s in spans:
            out.append(f"[{s.x:.1f}, {s.y:.1f}] ({_fmt_f64(s.font_size)}pt): {s.text}\n")
    return "".join(out)


def pdf_to_simple_text(data: bytes, extended: bool = False) -> str:
    """E6: line-grouped text with FIXED y-tolerance 3.0, spans joined
    ' ', lines '\n' (document.rs:837-885 — deliberately distinct from
    the layout path's font-size-relative tolerances); pages joined
    '\n' like the other formats."""
    doc = Document.parse(data, extended_filters=extended)
    out = []
    for page_idx in range(doc.page_count()):
        if any(out):  # string-empty check (lib.rs !output.is_empty())
            out.append("\n")
        out.append(doc.extract_page_text_string(page_idx))
    return "".join(out)


def pdf_page_count(data: bytes, extended: bool = False) -> int:
    return Document.parse(data, extended_filters=extended).page_count()


def pdf_page_to_csv(data: bytes, page: int, extended: bool = False) -> str:
    """Single page (0-indexed) as CSV — the WASM API's
    ``pdf_page_to_csv`` (reference wasm.rs:79-97).  An out-of-range
    page propagates the document error, like the Rust `?`."""
    doc = Document.parse(data, extended_filters=extended)
    return Table.from_spans(doc.extract_page_text(page)).to_csv()


class PageRangeError(ValueError):
    """CLI-level invalid ``--page N`` (reference main.rs:90-93)."""


def pdf_extract(
    data: bytes,
    fmt: str = "txt",
    page: int | None = None,
    extended: bool = False,
) -> str:
    """The CLI's whole output-building loop (main.rs:88-150): optional
    1-indexed single-page filter validated against the page count, and
    — unlike the lib.rs entry points — pages that fail to extract are
    SKIPPED rather than propagated (main.rs:102, 145-147).

    ``fmt`` additionally accepts ``simple`` (E6), which the Rust CLI
    does not expose; with ``page=None`` and a CLI format the output is
    byte-identical to ``pdf-table <file> --<fmt>`` stdout sans the
    trailing println newline (pinned by tests/test_reference_binary).
    """
    return _cli_extract(Document.parse(data, extended_filters=extended), fmt, page)


def _cli_extract(doc: Document, fmt: str, page: int | None) -> str:
    # main.rs:86 `doc.page_count().unwrap_or(0)`: a failed page-tree
    # walk means zero pages (empty output, success), not a document
    # error — unlike the lib.rs entry points, which propagate it
    try:
        n = doc.page_count()
    except PdfError:
        n = 0
    if page is None:
        idxs = range(n)
    elif 1 <= page <= n:
        idxs = [page - 1]
    else:
        raise PageRangeError(
            f"Invalid page number: {page} (document has {n} pages)"
        )

    out: list[str] = []
    for page_idx in idxs:
        if fmt == "simple":
            try:
                text = doc.extract_page_text_string(page_idx)
            except PdfError:
                continue
            if any(out):
                out.append("\n")
            out.append(text)
            continue
        try:
            spans = doc.extract_page_text(page_idx)
        except PdfError:
            continue  # CLI skips failing pages (main.rs:145-147)
        if fmt == "raw":
            if any(out):
                out.append("\n--- Page {} ---\n")
            for s in spans:
                out.append(
                    f"[{s.x:.1f}, {s.y:.1f}] ({_fmt_f64(s.font_size)}pt): {s.text}\n"
                )
        elif fmt in ("txt", "md"):
            elements = classify_spans(spans)
            if any(out):
                out.append("\n")
            out.append(
                elements_to_txt(elements)
                if fmt == "txt"
                else elements_to_markdown(elements)
            )
        else:  # csv / tsv / text
            table = Table.from_spans(spans)
            if any(out):
                out.append("\n")
            out.append(
                table.to_tsv()
                if fmt == "tsv"
                else table.to_text()
                if fmt == "text"
                # csv AND any unrecognized format: the reference CLI's
                # wildcard arm falls back to CSV (main.rs:141)
                else table.to_csv()
            )
    return "".join(out)


ALL_FORMATS = ("txt", "md", "csv", "tsv", "text", "raw", "simple")


def extract_all_formats(data: bytes, extended: bool = False) -> dict[str, str]:
    """Parse ONCE, render every format from the same per-page span
    sets — the production multi-format export path.  The CLI (and the
    per-format functions mirroring lib.rs) re-parse the document for
    each format; parsing dominates rendering, so a 7-format export
    re-pays the parse 7x.  The engine already separates parse
    (Document + ContentParser) from render (classify/Table/simple
    grouping), so each page is parsed to spans once and every renderer
    consumes the same list.  Byte-identical to calling the individual
    format functions (pinned by tests/test_api.py)."""
    doc = Document.parse(data, extended_filters=extended)
    outs: dict[str, list[str]] = {f: [] for f in ALL_FORMATS}
    for page_idx in range(doc.page_count()):
        spans = doc.extract_page_text(page_idx)
        elements = classify_spans(spans)
        table = Table.from_spans(spans)
        page = {
            "txt": elements_to_txt(elements),
            "md": elements_to_markdown(elements),
            "csv": table.to_csv(),
            "tsv": table.to_tsv(),
            "text": table.to_text(),
            # the simple path re-groups the SAME spans with its fixed
            # 3.0 tolerance (document.rs:837-885)
            "simple": simple_text_from_spans(spans),
        }
        raw = outs["raw"]
        if any(raw):
            raw.append("\n--- Page {} ---\n")
        for s in spans:
            raw.append(
                f"[{s.x:.1f}, {s.y:.1f}] ({_fmt_f64(s.font_size)}pt): {s.text}\n"
            )
        for fmt, rendered in page.items():
            out = outs[fmt]
            if any(out):  # string-empty check (lib.rs !output.is_empty())
                out.append("\n")
            out.append(rendered)
    return {fmt: "".join(parts) for fmt, parts in outs.items()}


# -- structured per-row extraction for the Spark layer ---------------------

_FORMATS = {
    "txt": pdf_to_text,
    "md": pdf_to_markdown,
    "csv": pdf_to_csv,
    "tsv": pdf_to_tsv,
    "text": pdf_to_aligned_text,
    "raw": pdf_to_raw_spans,
    "simple": pdf_to_simple_text,
}


def _txt_with_spans(doc: Document) -> tuple[str, list[tuple[int, int, str]], int]:
    """Render txt while tracking char-offset spans per element.

    Returns (text, [(start, end, kind)], n_elements) with text strictly
    equal to :func:`pdf_to_text`'s output (asserted in tests).  Kinds:
    ``heading1..heading3``, ``paragraph``, ``table``.
    """
    n_pages = doc.page_count()
    pieces: list[str] = []
    spans_out: list[tuple[int, int, str]] = []
    n_elements = 0
    offset = 0

    for page_idx in range(n_pages):
        elements = classify_spans(doc.extract_page_text(page_idx))
        page_parts: list[str] = []
        page_spans: list[tuple[int, int, str]] = []
        pos = 0
        for el in elements:
            if el.kind == HEADING:
                body, kind = el.text, f"heading{el.level}"
            elif el.kind == PARAGRAPH:
                body, kind = el.text, "paragraph"
            else:
                body, kind = el.table.to_text(), "table"
            page_spans.append((pos, pos + len(body), kind))
            page_parts.append(body)
            page_parts.append("\n\n")
            pos += len(body) + 2
            n_elements += 1
        page_text = "".join(page_parts).rstrip(RUST_WS)
        if page_text:
            page_text += "\n"
        if any(pieces):  # string-empty check (lib.rs !output.is_empty())
            pieces.append("\n")
            offset += 1
        # clamp spans to the trimmed page text
        for start, end, kind in page_spans:
            if start >= len(page_text):
                continue
            spans_out.append((offset + start, offset + min(end, len(page_text)), kind))
        pieces.append(page_text)
        offset += len(page_text)

    return "".join(pieces), spans_out, n_elements


def extract_document(
    data: bytes | None,
    fmt: str = "txt",
    page: int | None = None,
    extended_filters: bool = False,
) -> dict:
    """One Spark row in, one structured result out; never raises.

    Dispatches on magic bytes: ``%PDF-`` → PDF engine (document.rs:36),
    anything else → HTML boilerplate stripper.  Errors are values.
    ``page`` (1-indexed, PDF path only) scopes extraction to a single
    page with the CLI's validation semantics (main.rs:88-96); out of
    range becomes a ``page_range`` error row.  ``extended_filters``
    opt-in adds LZW/ASCII85/RunLength/predictor decode (public-spec
    algorithms the reference errors on) — default off keeps the path
    reference-exact.
    """
    result = {
        "text": "",
        "spans": [],
        "n_pages": 0,
        "n_elements": 0,
        "doc_type": "unknown",
        "error": None,
        "error_kind": None,
    }
    if data is None or len(data) == 0:
        result["error"] = "empty document"
        result["error_kind"] = "empty"
        return result

    if bytes(data[:5]) == b"%PDF-":
        result["doc_type"] = "pdf"
        try:
            doc = Document.parse(bytes(data), extended_filters=extended_filters)
            if page is not None:
                result["text"] = _cli_extract(doc, fmt, page)
            elif fmt == "txt":
                text, spans, n_elements = _txt_with_spans(doc)
                result["text"] = text
                result["spans"] = spans
                result["n_elements"] = n_elements
            elif fmt in _FORMATS:
                result["text"] = _FORMATS[fmt](
                    bytes(data), extended=extended_filters
                )
            else:
                # unrecognized fmt: the reference CLI's wildcard arm
                # renders CSV (main.rs:141) — never a KeyError that
                # would kill the executor task instead of making a row
                result["text"] = _cli_extract(doc, fmt, None)
            result["n_pages"] = doc.page_count()
        except PageRangeError as e:
            result["error"] = str(e)
            result["error_kind"] = "page_range"
        except PdfError as e:
            result["error"] = str(e)
            result["error_kind"] = e.kind
        except RecursionError:
            result["error"] = "page tree recursion limit"
            result["error_kind"] = "recursion"
        return result

    # HTML path (no reference oracle; pinned by our own goldens)
    result["doc_type"] = "html"
    try:
        from pdf_parser_spark.html.strip import extract_html

        text, spans = extract_html(bytes(data))
        result["text"] = text
        result["spans"] = spans
        result["n_pages"] = 1
        result["n_elements"] = len(spans)
    except Exception as e:  # noqa: BLE001 — row-level error, never task death
        result["error"] = str(e)
        result["error_kind"] = "html_parse"
    return result
