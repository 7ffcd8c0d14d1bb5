"""Corpus deduplication operators — exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine.

All plans are pure built-in-function DataFrame code (higher-order
array functions keep the per-document work JVM-side and NARROW — the
only shuffles are the candidate-pair self-joins, which are blocked on
LSH keys so the join fan-out is tiny).  Scale notes per operator in
the docstrings.

The synthetic ``documents`` table has no natural near-duplicates, so
the near-dup operators run over :func:`common.dedup_corpus` — every
document plus a deterministic perturbed twin — and must recover
exactly the (doc, twin) pairs.  This makes the oracle non-empty and
checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import (
    DEDUP_CORPUS_SQL,
    roundn,
    roundn_sql,
    dedup_corpus,
    h32,
    h32_sql,
    load_table,
    seeded_h32,
    seeded_h32_sql,
    shingles,
    shingles_sql,
    tokens,
    tokens_sql,
)

MINHASH_K = 16          # signature length
LSH_BANDS = 4           # 4 bands x 4 rows
LSH_ROWS = MINHASH_K // LSH_BANDS
SHINGLE_N = 3           # word 3-grams
JACCARD_THRESHOLD = 0.5


# -- exact dedup ------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text).

    Scale: one shuffle keyed on a 128-bit content hash — uniformly
    distributed by construction, no skew; partial aggregation
    (map-side combine) collapses duplicates before the exchange.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       count(*)  AS dup_count,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
"""


# -- MinHash + LSH ----------------------------------------------------------

# k-permutation family via affine transforms of ONE base hash per
# shingle (standard universal-hash MinHash): md5 runs once per
# shingle, the k permutations are integer arithmetic.  16x cheaper
# than k independent md5 calls — HOF expressions are interpreted
# (outside WholeStageCodegen), so per-element op cost is the budget.
MINHASH_PRIME = 4294967291  # largest 32-bit prime


def _perm(h, i):
    """h_i = (h * (2i+1) + 12345*i) mod p — exact in BIGINT on every
    engine (h < 2^32, multiplier ≤ 31 → product < 2^37)."""
    return (h * (2 * i + 1) + 12345 * i) % MINHASH_PRIME


def _perm_sql(h_expr: str, i_expr: str) -> str:
    return (
        f"(({h_expr}) * (2 * ({i_expr}) + 1) + 12345 * ({i_expr})) % {MINHASH_PRIME}"
    )


def _signature_col():
    """MinHash signature from the per-shingle base-hash array ``hs``:
    k minima, all higher-order functions (narrow, no shuffle)."""
    hs = F.col("hs")
    return F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_K - 1)),
        lambda i: F.array_min(F.transform(hs, lambda h: _perm(h, i))),
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, shingle set ``sh``, base-hash array ``hs``."""
    corpus = dedup_corpus(spark, sf_dir)
    return (
        corpus.select(
            "doc_id", shingles(tokens(F.col("text")), SHINGLE_N).alias("sh")
        )
        .filter(F.size("sh") >= 1)
        .withColumn("hs", F.transform("sh", lambda s: h32(s)))
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle → k-minhash signature →
    band keys → bucket self-join → signature-overlap estimate.

    Scale: the self-join is keyed on (band, band_key) — bucket sizes
    are ~Poisson(1) for non-dup docs, so the join explodes only where
    true near-dups exist.  The signature build is narrow; only band
    keys (doc_id, 4 × 32 bytes) shuffle, never the text.
    """
    # persist() is load-bearing: without a materialization point,
    # CollapseProject inlines the (16 x |shingles|)-hash signature
    # expression into every band key and join side, recomputing it
    # ~10x (observed 52 s → ~2 s at bench scale).  At cluster scale
    # this is where signatures get written to their own table.
    sig = (
        _shingled(spark, sf_dir)
        .select("doc_id", _signature_col().alias("sig"))
        .persist()
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * LSH_ROWS + 1, LSH_ROWS),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        ).cast("binary")
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    overlap = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda t: t
        )
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        roundn(overlap / F.lit(float(MINHASH_K)), 4).alias("est_jaccard"),
    )


def _minhash_sql_prelude() -> str:
    """Shared CTEs: corpus → shingles → base hash per shingle →
    k permutations → ordered signature list per doc."""
    sh = shingles_sql(tokens_sql("text"), SHINGLE_N)
    return (
        DEDUP_CORPUS_SQL
        + f""",
shingled AS (
  SELECT doc_id, {sh} AS sh FROM corpus
),
shingled_ok AS (
  SELECT * FROM shingled WHERE len(sh) >= 1
),
hashed AS (
  SELECT doc_id, {h32_sql("u.sh")} AS h
  FROM shingled_ok, unnest(sh) AS u(sh)
),
mh AS (
  SELECT doc_id, g.i AS i, min({_perm_sql("h", "g.i")}) AS v
  FROM hashed, generate_series(0, {MINHASH_K - 1}) AS g(i)
  GROUP BY doc_id, g.i
),
sigs AS (
  SELECT doc_id, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id
)
"""
    )


DEDUP_MINHASH_LSH_SQL = (
    _minhash_sql_prelude()
    + f""",
bands AS (
  SELECT doc_id, sig, g.b AS band,
         md5(array_to_string(sig[g.b * {LSH_ROWS} + 1 : g.b * {LSH_ROWS} + {LSH_ROWS}], ',')) AS band_key
  FROM sigs, generate_series(0, {LSH_BANDS - 1}) AS g(b)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(len(list_filter([sig_a[i] = sig_b[i] for i in generate_series(1, {MINHASH_K})], x -> x))
             / {float(MINHASH_K)}, 4) AS est_jaccard
FROM pairs
"""
)


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 32


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: per-bit majority vote over token
    hashes, plus an 8-bit prefix bucket for blocking.

    Scale: fully narrow — the entire simhash is higher-order array
    arithmetic inside whole-stage codegen; zero shuffle, zero Python.
    Bit extraction uses floor(h / 2^j) % 2 (exact in doubles for
    h < 2^32) because it has an identical SQL spelling.
    """
    corpus = dedup_corpus(spark, sf_dir)
    hs = F.transform(tokens(F.col("text")), lambda t: h32(t))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda j: F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + 2 * (F.floor(h / F.pow(F.lit(2.0), j)).cast("long") % 2)
            - 1,
        ),
    )
    simhash = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return corpus.select(
        "doc_id",
        simhash.alias("simhash"),
        F.floor(simhash / F.lit(float(1 << (SIMHASH_BITS - 8)))).cast("long").alias(
            "bucket"
        ),
    )


DEDUP_SIMHASH_SQL = (
    DEDUP_CORPUS_SQL
    + f""",
tok AS (
  SELECT doc_id, {tokens_sql("text")} AS t FROM corpus
),
th AS (
  SELECT doc_id, {h32_sql("u.tk")} AS h FROM tok, unnest(t) AS u(tk)
),
votes AS (
  SELECT doc_id, g.j AS j,
         sum(2 * (CAST(floor(h / power(2, g.j)) AS BIGINT) % 2) - 1) AS vote
  FROM th, generate_series(0, {SIMHASH_BITS - 1}) AS g(j)
  GROUP BY doc_id, g.j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN vote > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT doc_id, simhash,
       CAST(floor(simhash / {float(1 << (SIMHASH_BITS - 8))}) AS BIGINT) AS bucket
FROM sh
"""
)


# -- n-gram Jaccard ---------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over candidate pairs blocked on the
    single smallest shingle hash (1-permutation MinHash blocking).

    Scale: blocking bounds the self-join — only docs sharing their
    global-min shingle meet; Jaccard is then exact set arithmetic on
    the shingle arrays (array_intersect/array_union, JVM-side).
    """
    sh = _shingled(spark, sf_dir)
    # persist: same CollapseProject hazard as the LSH signature — the
    # shingle build would otherwise be inlined into both join sides
    # and the intersect/union arithmetic
    keyed = sh.select(
        "doc_id",
        "sh",
        F.array_min(F.transform("hs", lambda h: _perm(h, 0))).alias("mh0"),
    ).persist()
    a = keyed.alias("a")
    b = keyed.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    return (
        a.join(
            b,
            (F.col("a.mh0") == F.col("b.mh0"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            roundn(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


DEDUP_NGRAM_JACCARD_SQL = (
    DEDUP_CORPUS_SQL
    + f""",
shingled AS (
  SELECT doc_id, {shingles_sql(tokens_sql("text"), SHINGLE_N)} AS sh FROM corpus
),
keyed AS (
  SELECT doc_id, sh,
         list_min([({h32_sql("s")}) % {MINHASH_PRIME} for s in sh]) AS mh0
  FROM shingled WHERE len(sh) >= 1
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (floor((len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh)))) * 10000.0 + 0.5) / 10000.0) AS jaccard
FROM keyed a JOIN keyed b ON a.mh0 = b.mh0 AND a.doc_id < b.doc_id
WHERE (floor((len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh)))) * 10000.0 + 0.5) / 10000.0) >= {JACCARD_THRESHOLD}
"""
)


# -- embedding-cosine near-dup ---------------------------------------------

COSINE_DUP_THRESHOLD = 0.99
EMB_TWIN_LIMIT = 200  # twins injected for the first N vectors


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings ∪ perturbed twins (first component +0.01,
    vec_id + 1_000_000) — the deterministic near-dup ground truth."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    twin = emb.filter(F.col("vec_id") < EMB_TWIN_LIMIT).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("v", 1) + 0.01), F.slice("v", 2, 63)
        ).alias("v"),
    )
    return emb.unionByName(twin)


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (na * nb)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: 2-bit sign bucket (components 1-2) →
    within-bucket self-join → cosine ≥ 0.99.

    Scale: the sign-bucket is a cheap LSH family (random-hyperplane
    with axis-aligned planes); it cuts the pair space 4× here and Kx
    with K planes at cluster scale.  A perturbed twin lands in its
    original's bucket with prob ≈ 1 since only component 1 moves by
    +0.01.
    """
    corpus = _emb_corpus(spark, sf_dir).withColumn(
        "bucket",
        (F.element_at("v", 1) >= 0).cast("int") * 2
        + (F.element_at("v", 2) >= 0).cast("int"),
    )
    a = corpus.alias("a")
    b = corpus.alias("b")
    cos = _cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            roundn(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )


EMB_CORPUS_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
corpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_concat([v[1] + 0.01], v[2:64]) AS v
  FROM base WHERE vec_id < {EMB_TWIN_LIMIT}
)
"""

from pdf_parser_spark.ops.similarity import COSINE_SQL  # noqa: E402

_R4AB = roundn_sql(COSINE_SQL.format(a="a.v", b="b.v"), 4)

DEDUP_EMBEDDING_COSINE_SQL = (
    EMB_CORPUS_SQL
    + f""",
bucketed AS (
  SELECT vec_id, v,
         (CASE WHEN v[1] >= 0 THEN 2 ELSE 0 END + CASE WHEN v[2] >= 0 THEN 1 ELSE 0 END) AS bucket
  FROM corpus
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_R4AB} AS cosine
FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_R4AB} >= {COSINE_DUP_THRESHOLD}
"""
)


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_LSH_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL),
}
