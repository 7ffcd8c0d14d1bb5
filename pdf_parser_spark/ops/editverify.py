"""Edit-distance verification of LSH candidate pairs.

Production near-dup pipelines are two-stage: a cheap recall stage
(MinHash-LSH banding, ops/dedup.py) proposes candidate pairs, then a
precision stage verifies each candidate with an exact string metric
before anything is dropped (the shape used by web-corpus dedup since
Broder '97; the verify metric here is Levenshtein, built into both
engines as exact integer character edits).

Full-document Levenshtein is O(len_a x len_b) per pair — quadratic in
document size and unusable at 100 TB.  The verifier instead compares a
fixed TAIL_W-character tail window of each document plus the exact
length delta:

* for a true near-dup produced by a bounded edit of size k, the tail
  windows are the same text shifted by <= k, so the window edit
  distance is <= 2k (delete k at one end, insert k at the other) —
  independent of document length;
* for an LSH false positive (unrelated texts that collided in a
  band), the window distance is ~TAIL_W.

So ``verified = tail_edit <= EDIT_MAX AND len_delta <= EDIT_MAX``
separates the two populations with a constant per-pair cost bound of
TAIL_W^2 — the standard bounded-window trick that makes exact
verification affordable.

Scale shape: only the candidate pairs (LSH-bounded, O(near-dups) not
O(corpus^2)) ever fetch text, via two id-equi-joins; the projection to
(doc_id, tail, len) happens BEFORE the joins so at most TAIL_W chars
per side shuffle, never full documents; ``levenshtein`` runs JVM-side
inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import dedup_corpus
from pdf_parser_spark.ops.dedup import _lsh_pairs_sql, dedup_minhash_lsh

TAIL_W = 300     # tail-window width (chars) — bounds per-pair cost
EDIT_MAX = 48    # verify bound: 2k for edits of size k <= 24 chars


def dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, tail_edit, len_delta, verified) for every
    MinHash-LSH candidate pair."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    tails = dedup_corpus(spark, sf_dir).selectExpr(
        "doc_id",
        f"substr(text, greatest(1, length(text) - {TAIL_W - 1})) AS tail",
        "length(text) AS len",
    )
    return (
        pairs.join(
            tails.selectExpr(
                "doc_id AS doc_a", "tail AS tail_a", "len AS len_a"
            ),
            "doc_a",
        )
        .join(
            tails.selectExpr(
                "doc_id AS doc_b", "tail AS tail_b", "len AS len_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("tail_a", "tail_b").cast("long").alias("tail_edit"),
            F.abs(F.col("len_a") - F.col("len_b"))
            .cast("long")
            .alias("len_delta"),
        )
        # verified derives from the COLUMNS in a second Project so the
        # O(TAIL_W^2) levenshtein runs once per pair; CollapseProject
        # keeps multiply-referenced non-cheap expressions un-inlined
        .select(
            "doc_a",
            "doc_b",
            "tail_edit",
            "len_delta",
            (
                (F.col("tail_edit") <= EDIT_MAX)
                & (F.col("len_delta") <= EDIT_MAX)
            ).alias("verified"),
        )
    )


DEDUP_EDIT_VERIFY_SQL = (
    _lsh_pairs_sql()
    + f""",
tails AS (
  SELECT doc_id,
         substr(text, greatest(1, length(text) - {TAIL_W - 1})) AS tail,
         length(text) AS len
  FROM corpus
)
SELECT p.doc_a, p.doc_b,
       levenshtein(ta.tail, tb.tail)::BIGINT AS tail_edit,
       abs(ta.len - tb.len)::BIGINT AS len_delta,
       (levenshtein(ta.tail, tb.tail) <= {EDIT_MAX}
        AND abs(ta.len - tb.len) <= {EDIT_MAX}) AS verified
FROM pairs p
JOIN tails ta ON ta.doc_id = p.doc_a
JOIN tails tb ON tb.doc_id = p.doc_b
"""
)

QUERIES = {
    "dedup_edit_verify": (dedup_edit_verify, DEDUP_EDIT_VERIFY_SQL),
}
