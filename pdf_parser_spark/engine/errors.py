"""Error taxonomy for the PDF engine.

Mirrors the reference's per-document error variants
(/root/reference/src/error.rs:4-34).  At the Spark layer an engine
error never fails a task: it becomes a row-level ``decode_error``
string tallied into the lineage table.
"""

from __future__ import annotations


class PdfError(Exception):
    """Base class; ``kind`` feeds the per-partition failure tally."""

    kind = "pdf_error"


class MissingHeader(PdfError):
    kind = "missing_header"


class MissingEof(PdfError):
    kind = "missing_eof"


class ParseError(PdfError):
    kind = "parse"

    def __init__(self, position: int, message: str):
        super().__init__(f"Parse error at byte {position}: {message}")
        self.position = position


class InvalidXref(PdfError):
    kind = "invalid_xref"


class ObjectNotFound(PdfError):
    kind = "object_not_found"


class InvalidStructure(PdfError):
    kind = "invalid_structure"


class UnsupportedFilter(PdfError):
    kind = "unsupported_filter"


class DecompressError(PdfError):
    kind = "decompress"


class InvalidUtf8(PdfError):
    kind = "invalid_utf8"
