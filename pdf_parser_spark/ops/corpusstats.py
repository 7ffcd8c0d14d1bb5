"""Corpus-frequency operators: global n-gram counts and per-document
TF-IDF top terms.

The two classic "heavy aggregation" shapes of a webtext pipeline:
an explode→count over every shingle in the corpus (the vocabulary /
n-gram LM table build), and a two-sided frequency join (term frequency
per doc × inverted document frequency) that ranks each document's most
characteristic terms.  Both stay in built-in JVM functions end to end.

Determinism rules shared with the rest of the ops suite: ties are
broken by the lexicographically smallest term, TF-IDF is carried as an
exact integer pair (count, doc-frequency) plus a scaled BIGINT score
(``tf * 1e6 / df`` in integer arithmetic) so no float ever crosses the
engine-comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdf_parser_spark.ops.common import load_table, tokens, tokens_sql

NGRAM_N = 3          # shingle width for ngram_counts
NGRAM_TOPK = 50      # global top-k shingles reported
TFIDF_TOPK = 3       # per-document top terms reported
TFIDF_SCALE = 1_000_000


# ---------------------------------------------------------------------------
# ngram_counts — corpus-wide n-gram frequency top-k
# ---------------------------------------------------------------------------

def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``NGRAM_TOPK`` 3-grams across the corpus with doc counts.

    Scale: explode → count is THE canonical heavy aggregation; the
    count is map-side combinable so the exchange carries one partial
    per (gram, partition), not one row per occurrence.  The global
    top-k is a TakeOrderedAndProject over the (already tiny)
    aggregated set — no global sort of the gram table.  Ubiquitous
    grams (boilerplate) are hot KEYS but not hot GROUPS: partial
    aggregation flattens them before the shuffle, which is why this
    shape survives Zipfian skew at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    # zip of three shifted slices, NOT transform(sequence, element_at):
    # the lambda spelling re-evaluates the tokenization inside every
    # element_at (CollapseProject inlines it — the PLANS.md §6 hazard),
    # measured ~6x slower at sf0.1; slices evaluate it 3x per row total
    win = n - (NGRAM_N - 1)
    zipped = F.arrays_zip(
        F.slice(toks, 1, win).alias("t0"),
        F.slice(toks, 2, win).alias("t1"),
        F.slice(toks, 3, win).alias("t2"),
    )
    exploded = (
        docs.filter(n >= NGRAM_N)
        .select("doc_id", F.explode(zipped).alias("z"))
        .select(
            "doc_id",
            F.concat_ws(" ", "z.t0", "z.t1", "z.t2").alias("gram"),
        )
    )
    counted = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return counted.orderBy(
        F.desc("n_occurrences"), F.asc("gram")
    ).limit(NGRAM_TOPK)


NGRAM_COUNTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS tok FROM documents
), idx AS (
  SELECT doc_id, tok,
         unnest(generate_series(1, len(tok) - {NGRAM_N - 1})) AS i
  FROM toks WHERE len(tok) >= {NGRAM_N}
), grams AS (
  SELECT doc_id,
         tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
  FROM idx
)
SELECT gram,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM grams
GROUP BY 1
ORDER BY n_occurrences DESC, gram ASC
LIMIT {NGRAM_TOPK}
"""


# ---------------------------------------------------------------------------
# tfidf_top_terms — per-document characteristic terms
# ---------------------------------------------------------------------------

def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document, the ``TFIDF_TOPK`` terms with the highest
    ``tf/df`` ratio (integer-scaled), ties to the smaller term.

    Scale: term frequencies aggregate per (doc, term) — map-side
    combinable, one exchange of (doc_id, term) partials.  The document
    frequency table aggregates per term and is joined back; at real
    corpus scale the df table for ranking purposes is pruned to the
    terms that appear in the doc at hand, i.e. the join stays keyed on
    ``term`` with both sides already aggregated (no raw-occurrence
    fan-out through the join).  The per-doc top-k is a
    WindowGroupLimit (rank pushdown), not a full per-doc sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    term = F.explode(tokens(F.col("text"))).alias("term")
    occ = docs.select("doc_id", term)
    tf = occ.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = occ.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(df_tbl, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        # `div` is true BIGINT division (Spark) == `//` (DuckDB): no
        # float quotient whose floor/round could differ between engines
        F.expr(f"(tf * {TFIDF_SCALE}) div df").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH occ AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM occ GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         (tf.tf * {TFIDF_SCALE}) // dfreq.df AS score
  FROM tf JOIN dfreq USING (term)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, df, score
FROM ranked WHERE rank <= {TFIDF_TOPK}
"""


QUERIES = {
    "ngram_counts": (ngram_counts, NGRAM_COUNTS_SQL),
    "tfidf_top_terms": (tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
}
