"""Unicode text normalization (NFC) + cleanup — the canonicalization
step every multilingual webtext pipeline runs before hashing/dedup
(the same logical text arrives from different crawls as composed vs
decomposed code points; un-normalized, exact dedup misses them).

The sf documents are ASCII, so the operator first derives a "messy"
column deterministically (appending decomposed sequences — combining
acute, decomposed ring, a ligature — keyed by doc_id) and then
normalizes: NFC, control-char strip, whitespace collapse, trim.
Output carries md5 + lengths of the messy and clean forms, so the
value check covers the actual byte-level normalization, not counts.

Spark has no NFC built-in: normalization runs in an Arrow-vectorized
pandas UDF (`unicodedata.normalize` over a Series — the repo's
standard slow-path escape hatch, PLANS.md §6); control/whitespace
cleanup stays in JVM `regexp_replace`.  The DuckDB oracle uses the
engine's native `nfc_normalize` (utf8proc) — an independent
implementation; agreement verified on composed/decomposed/ligature
cases (both sides implement the same Unicode standard).

Scale: fully narrow — no shuffle; the UDF is the only Python and it
crosses one string column per direction.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import load_table

# decomposed suffix variants cycled by doc_id % 3:
#   0: "cafe" + COMBINING ACUTE (composes to é)
#   1: "A" + COMBINING RING ABOVE (composes to Å)
#   2: NBSP + "fi" (NFC keeps the ligature AND the NBSP — proves the
#      op does not over-normalize like NFKC would)
_SUFFIXES = ["cafe\u0301", "A\u030a", "\u00a0\ufb01"]

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RE = r"[ \t\r\n]+"


def _messy(doc_id, text):
    suffix = (
        F.when(doc_id % 3 == 0, F.lit(_SUFFIXES[0]))
        .when(doc_id % 3 == 1, F.lit(_SUFFIXES[1]))
        .otherwise(F.lit(_SUFFIXES[2]))
    )
    # a control char and doubled spaces, to exercise the cleanup
    return F.concat(text, F.lit("\x07  "), suffix)


def _make_nfc_udf():
    # created lazily: pandas_udf parses its DDL type against the
    # active session, so the decorator cannot run at import time
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize("NFC", t))

    return _nfc


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _nfc = _make_nfc_udf()
    docs = load_table(spark, sf_dir, "documents")
    messy = _messy(F.col("doc_id"), F.col("text"))
    staged = docs.select("doc_id", messy.alias("messy"))
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(_nfc(F.col("messy")), _CTRL_RE, ""),
            _WS_RE,
            " ",
        )
    )
    return staged.select(
        "doc_id",
        F.length("messy").alias("messy_len"),
        F.md5(F.col("messy")).alias("messy_md5"),
        F.length(cleaned).alias("clean_len"),
        F.md5(cleaned).alias("clean_md5"),
    )


TEXT_NORMALIZE_SQL = f"""
WITH staged AS (
  SELECT doc_id,
         text || chr(7) || '  ' ||
         CASE doc_id % 3
           WHEN 0 THEN 'cafe' || chr(769)
           WHEN 1 THEN 'A' || chr(778)
           ELSE chr(160) || chr(64257)
         END AS messy
  FROM documents
), cleaned AS (
  SELECT doc_id, messy,
         trim(regexp_replace(
             regexp_replace(nfc_normalize(messy),
                            '{_CTRL_RE}', '', 'g'),
             '{_WS_RE}', ' ', 'g')) AS clean
  FROM staged
)
SELECT doc_id,
       CAST(length(messy) AS INT) AS messy_len,
       md5(messy) AS messy_md5,
       CAST(length(clean) AS INT) AS clean_len,
       md5(clean) AS clean_md5
FROM cleaned
"""


QUERIES = {
    "text_normalize": (text_normalize, TEXT_NORMALIZE_SQL),
}
