"""Near-superset (containment) dedup via lossless prefix filtering.

Jaccard-style dedup misses the *quotation / snippet* failure mode of
web corpora: a short document wholly contained in a longer one (an
article and the page that quotes it) has low Jaccard but containment
C(A,B) = |S(A) ∩ S(B)| / |S(A)| ≈ 1.  Training pipelines drop the
contained copy (RefinedWeb/Dolma-style "subset dedup").

The operator reports every ordered pair with C(A,B) ≥ τ (= 4/5) over
word-3-gram shingle sets.

Scale design — exact *prefix filtering* (the PPJoin family, Xiao et
al., "Efficient Similarity Joins for Near Duplicate Detection",
WWW 2008 — public literature):

* An all-pairs containment join is quadratic; LSH-banding does not
  apply cleanly because containment is asymmetric (MinHash estimates
  Jaccard, not containment).  Prefix filtering is exact: order every
  document's shingles by one GLOBAL total order and take the first
  ``p = n - ceil(τ·n) + 1`` of them.  If B contains none of A's
  p-prefix, then A misses ≥ p > n - ceil(τ·n) shingles, so
  |A ∩ B| < ceil(τ·n) and C(A,B) < τ.  Candidate generation over the
  prefix is therefore LOSSLESS — the unblocked DuckDB oracle equality
  re-proves it every round.
* The global order is (document frequency ASC, hash ASC): each
  document probes the inverted index only through its *rarest*
  shingles, so index buckets stay small even when a boilerplate
  shingle is ubiquitous (the skew-killer — a hot shingle has maximal
  df and is ordered LAST, never into a prefix unless τ forces nearly
  the whole set, and a prefix that long means the doc is tiny).
* What shuffles: ONLY (sh, doc_id, n) int triples — the index, the
  df aggregate (map-side combinable), and the count-join that
  verifies candidates.  Shingle arrays and text never shuffle; the
  per-pair verification rows are bounded by the true intersection
  size, so a one-shared-shingle false candidate costs ~1 row.
* Verification is exact integer arithmetic (5·|∩| ≥ 4·n) — no float
  thresholds, so the value-hash gate stays clean.

The derived corpus injects the ground truth: every {SNIP_MOD}th
document also appears as a snippet (its first {SNIP_TOK} tokens,
doc_id + 2_000_000), whose shingle set is contained in its source by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdf_parser_spark.ops.common import (
    h32_sql,
    load_table,
    shingles_sql,
    tokens,
    tokens_sql,
)
from pdf_parser_spark.ops.dedup import SHINGLE_N, _make_shingle_hashes_udf

TAU_NUM, TAU_DEN = 4, 5  # containment threshold τ = 4/5
SNIP_MOD = 4             # every 4th doc also appears as a snippet
SNIP_TOK = 12            # snippet = first 12 tokens


def _containment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ injected snippets, as (doc_id, text)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).filter(F.size("tok") >= SHINGLE_N)
    snips = docs.filter(F.col("doc_id") % SNIP_MOD == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.slice("tok", 1, SNIP_TOK).alias("tok"),
    )
    return (
        docs.unionByName(snips)
        .select("doc_id", F.array_join("tok", " ").alias("text"))
    )


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered pairs (contained_doc, container_doc) with shingle-set
    containment ≥ τ, found via frequency-ordered prefix filtering
    (lossless — see module docstring) and verified with exact integer
    set arithmetic.
    """
    udf = _make_shingle_hashes_udf()
    # persist: the hash UDF feeds the index, the prefix AND the verify
    # join — without a materialization Catalyst's CollapseProject
    # re-runs it per consumer (same hazard measured 10x on the LSH
    # signature, dedup.py)
    # no size(shs) post-filter: the corpus pre-filters tok >=
    # SHINGLE_N, which is exactly the emptiness condition — and a
    # post-UDF filter would make Filter and Project each evaluate the
    # hash UDF (per-operator Arrow extraction; measured 2x on the LSH
    # signature, dedup.py)
    hashed = (
        _containment_corpus(spark, sf_dir)
        .select("doc_id", udf(F.col("text")).alias("shs"))
        .withColumn("n", F.size("shs").cast("long"))
        .persist()
    )
    ex = hashed.select("doc_id", "n", F.explode("shs").alias("sh"))
    # global shingle document-frequency: ONE map-side-combinable agg
    df_tbl = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # per-document prefix: the (df ASC, sh ASC)-smallest
    # p = n - ceil(τ·n) + 1 shingles; the window partitions by doc so
    # its sort is bounded by the document's own shingle count
    ranked = ex.join(df_tbl, "sh").withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("sh"))
        ),
    )
    prefix = ranked.filter(
        F.col("r")
        <= F.col("n") - F.expr(f"({TAU_NUM} * n + {TAU_DEN} - 1) div {TAU_DEN}") + 1
    ).select(F.col("doc_id").alias("da"), F.col("n").alias("na"), "sh")
    index = ex.select(
        F.col("doc_id").alias("db"), F.col("n").alias("nb"), "sh"
    )
    # candidates: prefix probe into the inverted index + exact size
    # bound (C ≥ τ needs |B| ≥ ceil(τ·n_a), relaxed to τ·n_b ≥ τ·τ·n_a
    # ⇒ 5·n_b ≥ 4·n_a — removal-only, oracle equality unaffected)
    cand = (
        prefix.join(index, "sh")
        .filter(
            (F.col("da") != F.col("db"))
            & (TAU_DEN * F.col("nb") >= TAU_NUM * F.col("na"))
        )
        .select("da", "na", "db")
        .distinct()
    )
    # verify as a pure COUNT join — shingle arrays never shuffle at
    # all: re-keying the exploded table by (doc, sh) and counting the
    # candidate-constrained matches computes |S(A)∩S(B)| exactly
    # (shingle sets are distinct per doc), moving only int triples.
    # The per-pair match rows are bounded by the true intersection
    # size, so a low-overlap candidate (the common case — one shared
    # rare shingle) costs ~1 row, not an array pair.
    ex_a = ex.select(F.col("doc_id").alias("da"), "sh")
    ex_b = ex.select(F.col("doc_id").alias("db"), "sh")
    inter = (
        cand.join(ex_a, "da")
        .join(ex_b, ["db", "sh"])
        .groupBy("da", "db", "na")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.filter(TAU_DEN * F.col("inter") >= TAU_NUM * F.col("na"))
        .select(
            F.col("da").alias("contained_doc"),
            F.col("db").alias("container_doc"),
            F.col("na").alias("n_sh"),
            F.col("inter").alias("n_shared"),
            F.floor(F.col("inter") * 100 / F.col("na")).alias("containment_x100"),
        )
    )


_SHS = f"list_distinct([{h32_sql('s')} for s in {{sh}}])"

DEDUP_CONTAINMENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql("text")} AS tok FROM documents
),
corpus AS (
  SELECT doc_id, array_to_string(tok, ' ') AS text
  FROM toks WHERE len(tok) >= {SHINGLE_N}
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(tok[1:{SNIP_TOK}], ' ') AS text
  FROM toks WHERE len(tok) >= {SHINGLE_N} AND doc_id % {SNIP_MOD} = 0
),
shingled AS (
  SELECT doc_id,
         {_SHS.format(sh=shingles_sql(tokens_sql("text"), SHINGLE_N))} AS shs
  FROM corpus
),
sized AS (
  SELECT doc_id, shs, CAST(len(shs) AS BIGINT) AS n
  FROM shingled WHERE len(shs) >= 1
),
ex AS (
  SELECT doc_id, unnest(shs) AS sh FROM sized
),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.da AS contained_doc, i.db AS container_doc,
       s.n AS n_sh, i.n_shared AS n_shared,
       CAST(floor(i.n_shared * 100.0 / s.n) AS BIGINT) AS containment_x100
FROM inter i JOIN sized s ON s.doc_id = i.da
WHERE {TAU_DEN} * i.n_shared >= {TAU_NUM} * s.n
"""


QUERIES = {
    "dedup_containment": (dedup_containment, DEDUP_CONTAINMENT_SQL),
}
