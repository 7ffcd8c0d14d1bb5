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

from pdf_parser_spark.engine.api import extract_document

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


def _extract_batch(html: pd.Series, fmt: str) -> pd.DataFrame:
    rows = []
    for data in html:
        r = extract_document(data, fmt=fmt)
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


def make_extract_udf(fmt: str = "txt"):
    """Struct-returning pandas UDF: ``html BINARY → extracted STRUCT``."""

    @pandas_udf(EXTRACT_TYPE)
    def extract(html: pd.Series) -> pd.DataFrame:
        return _extract_batch(html, fmt)

    return extract


def with_extraction(df, fmt: str = "txt", html_col: str = "html"):
    """Append extraction columns to a pages DataFrame.

    Narrow map — no shuffle; Catalyst prunes unused input columns
    around the UDF boundary.
    """
    extract = make_extract_udf(fmt)
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
