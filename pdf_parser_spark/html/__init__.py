"""DOM-heuristic HTML boilerplate stripping (main-content extraction)."""

from pdf_parser_spark.html.strip import extract_html, segment_blocks

__all__ = ["extract_html", "segment_blocks"]
