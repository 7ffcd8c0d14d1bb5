"""BM25 query retrieval: corpus top-k for a query set, exact-integer.

The retrieval primitive a training-data pipeline runs constantly:
rank corpus documents against a set of queries (benchmark prompts for
decontamination audits, seed queries for targeted data selection —
e.g. DSIR-style retrieval-then-filter, or the "search the corpus for
eval leakage" loop every release runs).  `tfidf_top_terms`
(ops/corpusstats.py) summarizes each DOCUMENT; this op answers
QUERIES — the query-conditional direction, Okapi BM25 (Robertson &
Zaragoza 2009, public).

Scoring is the standard BM25 with k1=1.2, b=0.75, carried out in
EXACT INTEGER arithmetic so the DuckDB oracle replays it bit-for-bit
(the ops/common.py ``log2_mbits`` discipline — float log/div would
flake the driver's value-hash gate near rounding boundaries):

* ``idf_mb  = L(N+1) − L(df+1)``  (L = integer-millibit log2; the
  +1-smoothed idf, always ≥ 0)
* ``norm    = 1000 − b_m + (b_m · dl · 1000) div avgdl_mil`` (scaled
  by 1000; b_m = 750)
* ``score   = Σ_t idf_mb(t) · tf · (k1_m + 1000)
                 div (tf·1000 + (k1_m · norm) div 1000)``  (k1_m=1200)

Queries are derived from the corpus itself (the driver's tables carry
no query set — same convention as ops/curation.py's benchmark
derivation): every 25th document contributes its first 4 tokens as a
query.  On a real deployment the query table is an input and the
derivation disappears.

Scale design (the point — this is the shape that survives 100 TB):

* the corpus token explosion is SEMI-JOIN FILTERED by the broadcast
  query-term set BEFORE any aggregation — only postings for the
  O(|queries| · q_len) query vocabulary ever exist, so the wide
  state is O(matching docs), not O(corpus tokens);
* document length comes from a scan-local ``size(tokens)`` projected
  BEFORE the explode — no second corpus scan, no dl join;
* df and the (N, avgdl) stats frame are tiny aggregates broadcast
  back; the only hash exchange carries (doc_id, term, tf, dl)
  integer rows;
* top-k per query is a window over the scored relation, whose size
  is bounded by queries × matching docs — never corpus-wide.
  Audit check: ``bm25-broadcast-query-side``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from pdf_parser_spark.ops.common import (
    load_table,
    log2_mbits,
    log2_mbits_sql,
    tokens,
    tokens_sql,
)

QUERY_MOD = 25   # every 25th document seeds a query
QUERY_LEN = 4    # first tokens forming the query
TOP_K = 5
K1_M = 1200      # k1 = 1.2, scaled by 1000
B_M = 750        # b = 0.75, scaled by 1000


def bm25_retrieval(
    spark: SparkSession,
    sf_dir: str,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, score_mb, rank): BM25 top-{TOP_K} corpus
    documents per derived query, scores in integer millibits.

    ``queries_df`` is the production swap-in hook (same design as
    ops/psl.py's ``rules`` and ops/blocklist.py's ``blocklist_rows``):
    a (query_id: long, term: string) table — benchmark prompts, seed
    queries — replaces the corpus-derived query set, and the
    derivation below disappears."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("tok")).filter(
        F.size("tok") >= 1
    )
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("tok")).alias("sum_dl"),
    )
    qterms = queries_df if queries_df is not None else (
        tok.filter(F.col("doc_id") % QUERY_MOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("tok", 1, QUERY_LEN)).alias("term"),
        )
        .distinct()
    )
    post = (
        tok.select(
            "doc_id",
            F.size("tok").cast("long").alias("dl"),
            F.explode("tok").alias("term"),
        )
        .join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl_mil", F.expr("sum_dl * 1000 div n_docs"))
        .withColumn(
            "idf_mb",
            log2_mbits("n_docs + 1") - log2_mbits("df + 1"),
        )
        .withColumn(
            "norm",
            F.expr(f"1000 - {B_M} + ({B_M} * dl * 1000) div avgdl_mil"),
        )
        .withColumn(
            "s",
            F.expr(
                f"idf_mb * tf * ({K1_M} + 1000)"
                f" div (tf * 1000 + ({K1_M} * norm) div 1000)"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score_mb"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_mb").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id", "score_mb", "rank")
    )


_TOK = tokens_sql("text")

BM25_RETRIEVAL_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
  WHERE len({_TOK}) >= 1
),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(len(tok))::BIGINT AS sum_dl
  FROM tok
),
qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT doc_id AS query_id,
           unnest(list_slice(tok, 1, {QUERY_LEN})) AS term
    FROM tok WHERE doc_id % {QUERY_MOD} = 0
  )
),
exploded AS (
  SELECT doc_id, len(tok)::BIGINT AS dl, unnest(tok) AS term FROM tok
),
post AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl) AS dl
  FROM exploded
  WHERE term IN (SELECT term FROM qterms)
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term
),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ({log2_mbits_sql('s.n_docs + 1')} - {log2_mbits_sql('d.df + 1')})
           * p.tf * ({K1_M} + 1000)
           // (p.tf * 1000
               + ({K1_M} * (1000 - {B_M}
                            + ({B_M} * p.dl * 1000)
                              // (s.sum_dl * 1000 // s.n_docs)))
                 // 1000)
         )::BIGINT AS score_mb
  FROM post p
  JOIN dfreq d USING (term)
  JOIN qterms q USING (term)
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score_mb, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY score_mb DESC, doc_id
  ) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


QUERIES = {
    "bm25_retrieval": (bm25_retrieval, BM25_RETRIEVAL_SQL),
}
