"""Training-batch assembly ops: fixed-token document chunking and
deterministic corpus composition re-weighting.

``chunk_documents`` is the split side of batch assembly (long
documents → fixed-token training chunks; ops/temporal.pack_sequences
is the merge side for short documents).  ``corpus_mix`` rebalances a
corpus toward a target per-source composition with a deterministic
hash filter — the "data mixture" stage of a training pipeline, where
sampling must be reproducible across reruns and engines (no RNG:
membership is a pure function of doc_id).

Both stay in built-in JVM expressions; the mix thresholds are computed
in exact integer arithmetic so the kept set is bit-identical on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import h32, h32_sql, load_table, tokens, tokens_sql

CHUNK_TOKENS = 32      # training-window width (tokens per chunk)
CHUNK_STRIDE = 24      # 8-token overlap between consecutive chunks

# corpus_mix: target composition over the source-id parity classes.
# Even sources are downweighted to 1/4 of their natural share; odd
# sources keep everything (a stand-in for "downsample the crawl,
# keep the curated set" mixing).
MIX_KEEP_NUM, MIX_KEEP_DEN = 1, 4   # even-source acceptance = 1/4
HASH_SPACE = 1 << 32                # h32 range


# ---------------------------------------------------------------------------
# chunk_documents — fixed-token sliding-window chunks
# ---------------------------------------------------------------------------

def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice each document's token stream into ``CHUNK_TOKENS``-wide
    windows advancing by ``CHUNK_STRIDE`` (so consecutive chunks share
    an 8-token overlap, the usual LM-pretraining trick to avoid
    boundary information loss).  The last window keeps its tail even
    when shorter.  Emits per-chunk ids, token counts and an md5 so the
    chunk CONTENT (not just its shape) is value-checked.

    Scale: fully narrow — one scan, no shuffle at all; chunking is
    ``sequence``/``slice`` codegen and the fan-out (~tokens/stride per
    doc) is bounded, so the op runs at parquet-scan speed and
    parallelism follows the input splits.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((n - 1) / CHUNK_STRIDE).cast("int") * CHUNK_STRIDE,
        ),
        F.lit(CHUNK_STRIDE),
    )
    chunked = docs.filter(n > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.concat_ws(
                    " ", F.slice(toks, s + 1, CHUNK_TOKENS)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(tokens(F.col("chunk"))).alias("n_tok"),
        F.md5(F.col("chunk")).alias("chunk_md5"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS tok FROM documents
  WHERE len({tokens_sql('text')}) > 0
), starts AS (
  SELECT doc_id, tok,
         unnest(generate_series(0,
                CAST(floor((len(tok) - 1) / {CHUNK_STRIDE}) AS BIGINT)
                  * {CHUNK_STRIDE},
                {CHUNK_STRIDE})) AS s
  FROM toks
), chunks AS (
  SELECT doc_id,
         CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
         array_to_string(tok[s + 1 : s + {CHUNK_TOKENS}], ' ') AS chunk
  FROM starts
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len({tokens_sql('chunk')}) AS INT) AS n_tok,
       md5(chunk) AS chunk_md5
FROM chunks
"""


# ---------------------------------------------------------------------------
# corpus_mix — deterministic composition re-weighting
# ---------------------------------------------------------------------------

def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample even-numbered sources to exactly-deterministically
    ~1/4 of their documents (odd sources pass through), then report
    the per-source audit: natural count, kept count, and the integer
    acceptance threshold used.

    Scale: membership is ``h32(doc_id) < threshold`` — a pure narrow
    filter, no RNG, no sort, reproducible shard-by-shard (the property
    a training-mixture stage must have: re-running the job or adding
    executors cannot change which documents are in the mix).  The
    audit rollup is one low-cardinality groupBy.  Thresholds are exact
    integers (``HASH_SPACE * num div den``), so both engines keep the
    identical document set.
    """
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract(F.col("source"), "(\\d+)$", 1).cast("long")
    thr = F.when(
        src_num % 2 == 0,
        F.lit(HASH_SPACE * MIX_KEEP_NUM // MIX_KEEP_DEN),
    ).otherwise(F.lit(HASH_SPACE))
    tagged = docs.select(
        "source",
        thr.alias("threshold"),
        (h32(F.col("doc_id").cast("string")) < thr).alias("kept"),
    )
    return tagged.groupBy("source", "threshold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    )


CORPUS_MIX_SQL = f"""
WITH tagged AS (
  SELECT source,
         CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 2 = 0
              THEN {HASH_SPACE * MIX_KEEP_NUM // MIX_KEEP_DEN}
              ELSE {HASH_SPACE} END AS threshold,
         ({h32_sql('doc_id::VARCHAR')} <
          CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 2 = 0
               THEN {HASH_SPACE * MIX_KEEP_NUM // MIX_KEEP_DEN}
               ELSE {HASH_SPACE} END) AS kept
  FROM documents
)
SELECT source, threshold,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM tagged
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# corpus_shuffle — deterministic global training order, shard-local sort
# ---------------------------------------------------------------------------

# shard count is a function of corpus size in production (keep shards
# ≫ cores and a few hundred MB each); 16 fits the test tables
SHUFFLE_SHARDS = 16
SHUFFLE_SEED = "shuffle-epoch-0"


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, pos, doc_id, okey): the deterministic global shuffle a
    training pipeline runs before writing shard files — every document
    gets a pseudorandom but seed-reproducible position, so data order
    is decorrelated from crawl order yet identical across reruns,
    engines, and cluster sizes (no RNG, no partition-order
    dependence).

    Scale: the naive spelling is ``orderBy(rand())`` — a corpus-global
    sort with nondeterministic keys.  Here the order key is
    ``seeded_h32(epoch_seed, doc_id)``; the shard is ``okey % S`` and
    the position is a row_number WITHIN the shard — ONE exchange
    (hash-partition on shard) followed by shard-local sorts of
    ``(okey, doc_id)`` pairs only.  Text never shuffles; shard count
    grows with the corpus so each local sort stays executor-sized.
    ``doc_id`` breaks h32 ties, making the order total on both
    engines.
    """
    from pyspark.sql import Window

    from pdf_parser_spark.ops.common import seeded_h32

    docs = load_table(spark, sf_dir, "documents")
    key = seeded_h32(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string"))
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return (
        docs.select("doc_id", key.alias("okey"))
        .withColumn("shard", (F.col("okey") % SHUFFLE_SHARDS).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("shard", "pos", "doc_id", "okey")
    )


def _seeded_h32_sql_local(expr: str) -> str:
    from pdf_parser_spark.ops.common import seeded_h32_sql

    return seeded_h32_sql(f"'{SHUFFLE_SEED}'", expr)


CORPUS_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         {{okey}} AS okey,
         CAST({{okey}} % {SHUFFLE_SHARDS} AS INT) AS shard
  FROM documents
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY okey, doc_id) AS INT) AS pos,
       doc_id, okey
FROM keyed
""".replace("{okey}", _seeded_h32_sql_local("doc_id::VARCHAR"))


QUERIES = {
    "chunk_documents": (chunk_documents, CHUNK_DOCUMENTS_SQL),
    "corpus_mix": (corpus_mix, CORPUS_MIX_SQL),
    "corpus_shuffle": (corpus_shuffle, CORPUS_SHUFFLE_SQL),
}
