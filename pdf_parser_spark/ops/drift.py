"""Batch-over-corpus token drift: which words surged or collapsed in
the newest crawl batch.

A dump-over-dump pipeline watches its vocabulary: a token whose rate
jumps 100× between dumps is usually a spam flood, a template change,
or an encoding bug — all things a curation gate wants to see BEFORE
the batch is admitted (WIMBD-style corpus telemetry, Elazar et al.
2023, arXiv:2310.20707 — counts and rates only, all public method).

Shape: the new batch is doc_id % NEW_BATCH_MOD == 0 (the same
convention as the incremental admission ops); the corpus is the rest.
Rates are exact integers (parts-per-million, floor division) so the
drift score, ordering, and the value hash are engine-identical —
no floats anywhere.

Scale: tokens explode once, tagged with their side; the only shuffle
carries (token, side) partial counts — map-side combine collapses the
per-partition explosion before the exchange, so shuffle volume is
O(vocab × partitions), never O(token instances).  Totals come from a
second tiny aggregate over the already-aggregated (token, side)
counts — the corpus is never re-scanned — and join back via
broadcast.  The final top-K is a TakeOrdered over vocab-sized rows
with a deterministic (|drift| DESC, token ASC) tie-break.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.ops.common import load_table, tokens, tokens_sql
from pdf_parser_spark.ops.filtering import NEW_BATCH_MOD

PPM = 1_000_000
MIN_TOTAL = 5   # ignore tokens with fewer than 5 occurrences overall
TOP_K = 50


def token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K tokens by |rate drift| between the new batch and the
    existing corpus, rates in exact integer parts-per-million."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    is_new = (F.col("doc_id") % NEW_BATCH_MOD == 0).cast("long")
    counts = (
        docs.groupBy("tok")
        .agg(
            F.sum(is_new).alias("cnt_new"),
            F.sum(1 - is_new).alias("cnt_old"),
        )
        .filter(F.col("cnt_new") + F.col("cnt_old") >= MIN_TOTAL)
    )
    totals = counts.agg(
        F.sum("cnt_new").alias("total_new"),
        F.sum("cnt_old").alias("total_old"),
    )
    # 1-row totals frame: always a broadcast nested-loop of one row,
    # never a shuffle
    scored = counts.join(F.broadcast(totals)).select(
        "tok",
        "cnt_new",
        "cnt_old",
        # integral DIV, not float-divide-then-cast: a double quotient
        # that rounds up across an integer boundary would truncate to
        # a different value than DuckDB's exact `//`
        F.expr(f"cnt_new * {PPM}L DIV total_new").alias("rpm_new"),
        F.expr(f"cnt_old * {PPM}L DIV total_old").alias("rpm_old"),
    )
    scored = scored.withColumn(
        "drift_ppm", F.col("rpm_new") - F.col("rpm_old")
    )
    return scored.orderBy(
        F.abs(F.col("drift_ppm")).desc(), F.col("tok").asc()
    ).limit(TOP_K)


TOKEN_DRIFT_SQL = f"""
WITH exploded AS (
  SELECT doc_id, u.tok AS tok
  FROM documents, unnest({tokens_sql("text")}) AS u(tok)
),
counts AS (
  SELECT tok,
         sum(CASE WHEN doc_id % {NEW_BATCH_MOD} = 0 THEN 1 ELSE 0 END) AS cnt_new,
         sum(CASE WHEN doc_id % {NEW_BATCH_MOD} = 0 THEN 0 ELSE 1 END) AS cnt_old
  FROM exploded
  GROUP BY tok
  HAVING cnt_new + cnt_old >= {MIN_TOTAL}
),
totals AS (
  SELECT sum(cnt_new) AS total_new, sum(cnt_old) AS total_old FROM counts
),
scored AS (
  SELECT tok, cnt_new, cnt_old,
         (cnt_new * {PPM}) // total_new AS rpm_new,
         (cnt_old * {PPM}) // total_old AS rpm_old
  FROM counts, totals
)
SELECT tok, cnt_new::BIGINT AS cnt_new, cnt_old::BIGINT AS cnt_old,
       rpm_new::BIGINT AS rpm_new, rpm_old::BIGINT AS rpm_old,
       (rpm_new - rpm_old)::BIGINT AS drift_ppm
FROM scored
ORDER BY abs(rpm_new - rpm_old) DESC, tok ASC
LIMIT {TOP_K}
"""


QUERIES = {
    "token_drift": (token_drift, TOKEN_DRIFT_SQL),
}
