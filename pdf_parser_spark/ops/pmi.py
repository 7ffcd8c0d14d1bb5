"""Collocation mining: corpus top-k adjacent pairs by integer PMI.

The vocabulary-QA companion to ops/corpusstats.py's raw n-gram
counts: pointwise mutual information ranks ADJACENT TOKEN PAIRS by
how much more often they co-occur than their unigram frequencies
predict (Church & Hanks 1990, "Word Association Norms, Mutual
Information, and Lexicography" — the classic collocation measure;
used in tokenizer/vocab QA and phrase-table induction, e.g. the
word2vec phrase pass, Mikolov et al. 2013 — all public).  Raw counts
surface boilerplate; PMI surfaces "new york"-style units whose parts
rarely appear apart.

    pmi = log2( (c_ab / N_b) / ((c_a / N_u) · (c_b / N_u)) )

carried ENTIRELY in integer millibits as a sum of per-count logs:

    pmi_mb = L(c_ab) + 2·L(N_u) − L(N_b) − L(c_a) − L(c_b)

(L = ops/common.log2_mbits).  Spelling it as a sum of individual-count
logs rather than one log of a product is load-bearing twice over: the
product ``c_ab · N_u²`` overflows BIGINT at real corpus scale, and
the interpolated L is only exactly distributive when applied to each
count separately — both engines evaluate the identical six-term sum,
so the value-hash gate holds bit-for-bit.  (The interpolation error
of each term is < 0.086 bits; errors of a fixed six-term shape cancel
to well under ranking granularity for counts > 16, and exactness
across engines — the actual gate — is unconditional.)

Scale design:

* two canonical explode→count aggregates (bigrams; unigrams), both
  map-side combinable — ubiquitous pairs are hot keys but partials
  flatten them before the shuffle (the ngram_counts argument);
* the min-support filter (``c_ab >= {MIN_PAIR}``) is applied to the
  AGGREGATED pair relation before any join, so the join inputs are
  support-bounded, never occurrence-sized;
* unigram counts attach via two equi-joins on the term key — rows are
  (term, count) pairs; AQE upgrades to broadcast when the surviving
  vocabulary is small, and at 10^7-term scale the shuffle join is the
  correct plan (a forced broadcast would OOM the executors);
* N_u / N_b are a 1-row broadcast frame; the global top-k compiles to
  TakeOrderedAndProject (per-partition heap, driver merge of K rows —
  no global sort).  Audit check: ``pmi-support-bounded-joins``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import (
    load_table,
    log2_mbits,
    log2_mbits_sql,
    tokens,
    tokens_sql,
)

MIN_PAIR = 5   # minimum bigram support entering the ranking
TOP_K = 50


def pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t0, t1, c_ab, c_a, c_b, pmi_mb): top-{TOP_K} adjacent pairs by
    integer-millibit PMI, ties to the lexicographically first pair."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    win = n - 1
    zipped = F.arrays_zip(
        F.slice(toks, 1, win).alias("t0"),
        F.slice(toks, 2, win).alias("t1"),
    )
    pairs = (
        docs.filter(n >= 2)
        .select(F.explode(zipped).alias("z"))
        .select(F.col("z.t0").alias("t0"), F.col("z.t1").alias("t1"))
        .groupBy("t0", "t1")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= MIN_PAIR)
    )
    uni = (
        docs.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = docs.select(n.alias("n")).filter(F.col("n") >= 1).agg(
        F.sum("n").alias("n_u"),
        F.sum(F.greatest(F.col("n") - 1, F.lit(0))).alias("n_b"),
    )
    scored = (
        pairs.join(uni.withColumnRenamed("t", "t0")
                   .withColumnRenamed("c", "c_a"), "t0")
        .join(uni.withColumnRenamed("t", "t1")
              .withColumnRenamed("c", "c_b"), "t1")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi_mb",
            log2_mbits("c_ab") + 2 * log2_mbits("n_u")
            - log2_mbits("n_b") - log2_mbits("c_a") - log2_mbits("c_b"),
        )
    )
    return (
        scored.select("t0", "t1", "c_ab", "c_a", "c_b", "pmi_mb")
        .orderBy(F.col("pmi_mb").desc(), F.col("t0"), F.col("t1"))
        .limit(TOP_K)
    )


_TOK = tokens_sql("text")

PMI_TOP_PAIRS_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
),
pairs AS (
  SELECT t0, t1, count(*)::BIGINT AS c_ab FROM (
    SELECT tok[i] AS t0, tok[i + 1] AS t1 FROM (
      SELECT tok, unnest(range(1, len(tok))) AS i
      FROM tok WHERE len(tok) >= 2
    )
  )
  GROUP BY t0, t1
  HAVING count(*) >= {MIN_PAIR}
),
uni AS (
  SELECT t, count(*)::BIGINT AS c FROM (
    SELECT unnest(tok) AS t FROM tok
  )
  GROUP BY t
),
totals AS (
  SELECT sum(len(tok))::BIGINT AS n_u,
         sum(greatest(len(tok) - 1, 0))::BIGINT AS n_b
  FROM tok WHERE len(tok) >= 1
)
SELECT p.t0, p.t1, p.c_ab, a.c AS c_a, b.c AS c_b,
       ({log2_mbits_sql('p.c_ab')} + 2 * {log2_mbits_sql('t.n_u')}
        - {log2_mbits_sql('t.n_b')} - {log2_mbits_sql('a.c')}
        - {log2_mbits_sql('b.c')})::BIGINT AS pmi_mb
FROM pairs p
JOIN uni a ON a.t = p.t0
JOIN uni b ON b.t = p.t1
CROSS JOIN totals t
ORDER BY pmi_mb DESC, p.t0, p.t1
LIMIT {TOP_K}
"""


QUERIES = {
    "pmi_top_pairs": (pmi_top_pairs, PMI_TOP_PAIRS_SQL),
}
