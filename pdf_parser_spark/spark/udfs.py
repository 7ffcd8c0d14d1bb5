"""Arrow-vectorized pandas UDFs wrapping the pure-Python engine.

The engine (SURVEY.md §2) runs unchanged inside these UDFs — one code
path for oracle and cluster, so reference-vs-Spark identity is
structural.  Vectorization is ACROSS documents: each UDF call receives
an Arrow batch of whole documents (the parallel unit at 10^12-doc
scale) and loops a C-speed-dominated pipeline over them; there is no
per-row Python at the Spark plan level (zero row-at-a-time UDFs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_parser_spark.engine.api import (
    ALL_FORMATS,
    extract_all_formats,
    extract_document,
)
from pdf_parser_spark.engine.errors import PdfError

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("start", LongType()),
            StructField("end", LongType()),
            StructField("kind", StringType()),
        ]
    )
)

EXTRACT_TYPE = StructType(
    [
        StructField("text", StringType()),
        StructField("spans", SPAN_TYPE),
        StructField("n_pages", IntegerType()),
        StructField("n_elements", IntegerType()),
        StructField("doc_type", StringType()),
        StructField("error", StringType()),
        StructField("error_kind", StringType()),
    ]
)


def _extract_batch(html: pd.Series, fmt: str, page: int | None) -> pd.DataFrame:
    rows = []
    for data in html:
        r = extract_document(data, fmt=fmt, page=page)
        rows.append(
            (
                r["text"],
                [
                    {"start": s, "end": e, "kind": k}
                    for (s, e, k) in r["spans"]
                ],
                r["n_pages"],
                r["n_elements"],
                r["doc_type"],
                r["error"],
                r["error_kind"],
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "text",
            "spans",
            "n_pages",
            "n_elements",
            "doc_type",
            "error",
            "error_kind",
        ],
    )


def make_extract_udf(fmt: str = "txt", page: int | None = None):
    """Struct-returning pandas UDF: ``html BINARY → extracted STRUCT``.
    ``page`` scopes PDF extraction to one 1-indexed page (CLI --page
    semantics, main.rs:88-96)."""

    @pandas_udf(EXTRACT_TYPE)
    def extract(html: pd.Series) -> pd.DataFrame:
        return _extract_batch(html, fmt, page)

    return extract


def with_extraction(df, fmt: str = "txt", html_col: str = "html",
                    page: int | None = None):
    """Append extraction columns to a pages DataFrame.

    Narrow map — no shuffle; Catalyst prunes unused input columns
    around the UDF boundary.
    """
    extract = make_extract_udf(fmt, page)
    return (
        df.withColumn("_ex", extract(F.col(html_col)))
        .withColumn("text_extracted", F.col("_ex.text"))
        .withColumn("spans", F.col("_ex.spans"))
        .withColumn("n_pages", F.col("_ex.n_pages"))
        .withColumn("n_elements", F.col("_ex.n_elements"))
        .withColumn("doc_type", F.col("_ex.doc_type"))
        .withColumn("decode_error", F.col("_ex.error"))
        .withColumn("decode_error_kind", F.col("_ex.error_kind"))
        .drop("_ex")
    )


FORMATS_TYPE = StructType(
    [
        StructField(
            "formats",
            ArrayType(
                StructType(
                    [
                        StructField("fmt", StringType()),
                        StructField("text", StringType()),
                    ]
                )
            ),
        ),
        StructField("doc_type", StringType()),
        StructField("error", StringType()),
        StructField("error_kind", StringType()),
    ]
)


@pandas_udf(FORMATS_TYPE)
def extract_formats_udf(html: pd.Series) -> pd.DataFrame:
    """All output formats from ONE parse per document
    (api.extract_all_formats) — the production multi-format export.
    A per-format run_extract would re-parse every document once per
    format; parsing dominates, so this is ~5x cheaper at any scale."""
    rows = []
    for data in html:
        doc_type, error, error_kind = "unknown", None, None
        texts: dict[str, str] = {}
        if data is None or len(data) == 0:
            error, error_kind = "empty document", "empty"
        elif bytes(data[:5]) == b"%PDF-":
            doc_type = "pdf"
            try:
                texts = extract_all_formats(bytes(data))
            except PdfError as e:
                error, error_kind = str(e), e.kind
            except RecursionError:
                error, error_kind = "page tree recursion limit", "recursion"
        else:
            doc_type = "html"
            r = extract_document(bytes(data))
            error, error_kind = r["error"], r["error_kind"]
            texts = {f: r["text"] for f in ALL_FORMATS}
        rows.append(
            (
                [
                    {"fmt": f, "text": texts.get(f, "")}
                    for f in ALL_FORMATS
                ],
                doc_type,
                error,
                error_kind,
            )
        )
    return pd.DataFrame(rows, columns=["formats", "doc_type", "error", "error_kind"])
