"""Pure-Python PDF extraction core.

This package is the single implementation of the per-document
semantics (reference: /root/reference/src, Rust crate
``pdf-text-extract``).  It is deliberately Spark-free: the same code
runs directly in unit tests (the oracle) and inside Arrow-batched
pandas UDFs on executors, so reference-vs-Spark identity is
structural rather than asserted.
"""

from pdf_parser_spark.engine.api import (
    PageRangeError,
    extract_document,
    pdf_extract,
    pdf_page_count,
    pdf_page_to_csv,
    pdf_to_aligned_text,
    pdf_to_csv,
    pdf_to_markdown,
    pdf_to_raw_spans,
    pdf_to_simple_text,
    pdf_to_text,
    pdf_to_tsv,
)
from pdf_parser_spark.engine.content import ContentParser, TextSpan
from pdf_parser_spark.engine.document import Document
from pdf_parser_spark.engine.errors import PdfError
from pdf_parser_spark.engine.layout import classify_spans
from pdf_parser_spark.engine.render import elements_to_markdown, elements_to_txt
from pdf_parser_spark.engine.table import Table

__all__ = [
    "ContentParser",
    "PageRangeError",
    "Document",
    "PdfError",
    "Table",
    "TextSpan",
    "classify_spans",
    "elements_to_markdown",
    "elements_to_txt",
    "extract_document",
    "pdf_extract",
    "pdf_page_count",
    "pdf_page_to_csv",
    "pdf_to_aligned_text",
    "pdf_to_csv",
    "pdf_to_markdown",
    "pdf_to_raw_spans",
    "pdf_to_simple_text",
    "pdf_to_text",
    "pdf_to_tsv",
]
