"""Incremental NEAR-duplicate admission: MinHash-LSH a new crawl
batch against the existing corpus index.

ops/filtering.py's ``incremental_dedup`` admits a new batch by EXACT
content hash; production pipelines (CC dump N vs dumps 1..N-1) also
need the near-dup variant — a re-crawled page whose boilerplate
shifted slightly must still be rejected.  This op composes the shared
MinHash machinery (ops/dedup.py) into the cross-batch shape:

  batch  = original documents with doc_id % NEW_BATCH_MOD == 0
  index  = everything else (originals of other residues + ALL
           perturbed twins — dedup_corpus guarantees each batch doc's
           near-dup twin sits in the index, so the oracle is non-empty)

The batch predicate tests the ORIGINAL id space (doc_id < 1_000_000)
because 10^6 ≡ 0 (mod 5): twins inherit their original's residue, and
a residue-only split would put each batch doc's twin inside the batch
instead of the index it must be checked against.

Scale: the signature relation is computed once and persisted (at
cluster scale the index side is a PRECOMPUTED table from prior dumps —
only the new batch pays the signature UDF).  The candidate join is
keyed on (band, band_key): bucket sizes are ~Poisson(1) for unrelated
docs, so it explodes only where true near-dups exist, and only
(doc_id, 16-long signature, 32-byte band key) rows ever shuffle —
never text.  The verdict aggregate is keyed on batch doc_id, i.e.
batch-sized, and re-running per dump costs O(batch), not O(corpus²).

Reference parity: the reference engine (Rust pdf-text-extract) has no
corpus layer; this is part of the §2-beyond training-data surface.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.ops.common import dedup_corpus, tokens
from pdf_parser_spark.ops.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    SHINGLE_N,
    _make_sig_udf,
    _minhash_sql_prelude,
    lsh_bands,
)
from pdf_parser_spark.ops.filtering import NEW_BATCH_MOD

# A candidate with estimated jaccard >= ADMIT_THRESH blocks admission.
# 0.5 sits between twin pairs (J = (n-3)/(n-2), ~0.9 for real docs,
# est exact multiples of 1/16) and band-collision noise (~0-0.25).
ADMIT_THRESH = 0.5


def _batch_pred():
    return (F.col("doc_id") < 1_000_000) & (
        F.col("doc_id") % NEW_BATCH_MOD == 0
    )


def incremental_minhash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per new-batch document: how many index docs share an LSH band,
    the max signature-estimated jaccard among them, and the admission
    verdict (no candidate at or above ADMIT_THRESH)."""
    sig_udf = _make_sig_udf()
    sig = (
        dedup_corpus(spark, sf_dir)
        .filter(F.size(tokens(F.col("text"))) >= SHINGLE_N)
        .select("doc_id", sig_udf(F.col("text")).alias("sig"))
        .persist()
    )
    # Materialize ONCE: sig feeds both band-join sides and the final
    # left join — three references, and concurrent first-computation
    # of an unmaterialized cached relation is not deduped (PLANS.md
    # §12), so without an action the Arrow signature pass runs up to
    # three times.
    sig.count()
    batch_sig = sig.filter(_batch_pred())
    index_sig = sig.filter(~_batch_pred())

    nb = lsh_bands(batch_sig).alias("nb")
    ob = lsh_bands(index_sig).alias("ob")
    cand = (
        nb.join(
            ob,
            (F.col("nb.band") == F.col("ob.band"))
            & (F.col("nb.band_key") == F.col("ob.band_key")),
        )
        .select(
            F.col("nb.doc_id").alias("doc_id"),
            F.col("ob.doc_id").alias("base_id"),
            F.col("nb.sig").alias("sig_n"),
            F.col("ob.sig").alias("sig_o"),
        )
        .dropDuplicates(["doc_id", "base_id"])
    )
    overlap = F.size(
        F.filter(
            F.zip_with("sig_n", "sig_o", lambda x, y: x == y), lambda t: t
        )
    )
    # est jaccard = overlap/16: exact multiples of 2^-4, so max() and
    # the threshold compare are bit-exact vs the DuckDB twin — no
    # rounding needed anywhere
    scored = cand.select(
        "doc_id", (overlap / F.lit(float(MINHASH_K))).alias("est_j")
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max("est_j").alias("max_est_jaccard"),
    )
    out = (
        batch_sig.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            F.coalesce("max_est_jaccard", F.lit(0.0)).alias(
                "max_est_jaccard"
            ),
            (
                F.coalesce("max_est_jaccard", F.lit(0.0))
                < F.lit(ADMIT_THRESH)
            ).alias("admit"),
        )
    )
    return out


_BATCH_SQL_PRED = f"doc_id < 1000000 AND doc_id % {NEW_BATCH_MOD} = 0"

INCREMENTAL_MINHASH_DEDUP_SQL = (
    _minhash_sql_prelude()
    + f""",
bands AS (
  SELECT doc_id, sig, g.b AS band,
         md5(array_to_string(sig[g.b * {LSH_ROWS} + 1 : g.b * {LSH_ROWS} + {LSH_ROWS}], ',')) AS band_key
  FROM sigs, generate_series(0, {LSH_BANDS - 1}) AS g(b)
),
nb AS (SELECT * FROM bands WHERE {_BATCH_SQL_PRED}),
ob AS (SELECT * FROM bands WHERE NOT ({_BATCH_SQL_PRED})),
cand AS (
  SELECT DISTINCT nb.doc_id AS doc_id, ob.doc_id AS base_id,
                  nb.sig AS sig_n, ob.sig AS sig_o
  FROM nb JOIN ob ON nb.band = ob.band AND nb.band_key = ob.band_key
),
scored AS (
  SELECT doc_id,
         len(list_filter([sig_n[i] = sig_o[i] for i in generate_series(1, {MINHASH_K})], x -> x))
           / {float(MINHASH_K)} AS est_j
  FROM cand
),
agg AS (
  SELECT doc_id, count(*) AS n_candidates, max(est_j) AS max_est_jaccard
  FROM scored GROUP BY doc_id
)
SELECT s.doc_id,
       coalesce(a.n_candidates, 0) AS n_candidates,
       coalesce(a.max_est_jaccard, 0.0) AS max_est_jaccard,
       coalesce(a.max_est_jaccard, 0.0) < {ADMIT_THRESH} AS admit
FROM sigs s LEFT JOIN agg a ON s.doc_id = a.doc_id
WHERE s.doc_id < 1000000 AND s.doc_id % {NEW_BATCH_MOD} = 0
"""
)


QUERIES = {
    "incremental_minhash_dedup": (
        incremental_minhash_dedup,
        INCREMENTAL_MINHASH_DEDUP_SQL,
    ),
}
