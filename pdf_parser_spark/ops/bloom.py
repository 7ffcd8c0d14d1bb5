"""Bloom-filter corpus membership: sketch-based incremental dedup.

``incremental_dedup`` (ops/filtering.py) answers "is this new page
already in the corpus?" with an exact join on the content hash — at
10^12 documents that join's build side is the whole corpus hash set
(terabytes).  The standard production alternative (Bloom 1970, CACM —
public) is a Bloom filter: an m-bit array with k hash functions whose
"maybe present" answer is wrong only with probability
``(1 - e^(-kn/m))^k``.  The filter over the full corpus is a few GB at
m = 10 bits/doc — broadcastable state that admits a new crawl batch
with ZERO corpus-side shuffle at query time.

Determinism: bit positions derive from the shared md5-based seeded
h32 family (``pos_i = h32(i | md5(text)) % m``), so the filter words,
every membership verdict, and even the false positives are
engine-identical — the DuckDB oracle reproduces the exact same bit
array.  Words are 32-bit (packed into BIGINT) because DuckDB's ``<<``
overflows at bit 63; 32-bit words keep every mask positive on both
engines.

Scale shape:
* build: corpus → (word_idx, mask) per (doc, hash-seed) →
  ``groupBy(word_idx).agg(bit_or(mask))`` — partial-combines map-side
  (OR is associative+commutative), so the only shuffle is O(m/32)
  word rows, NOT corpus rows.  In production the filter is built once
  per corpus snapshot and persisted next to it.
* probe: batch × k probe rows join the **broadcast** word table; the
  corpus itself is never touched.  The verdict joins back per doc_id
  (bool_and over the k bits).
* The op also computes ground truth (exact md5 membership) so its
  output certifies the sketch's contract: no false negatives, and a
  measurable false-positive row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import (
    load_table,
    seeded_h32,
    seeded_h32_sql,
    tokens,
    tokens_sql,
)

M_BITS = 1 << 16      # filter size in bits (power of 2)
WORD = 32             # bits per packed word (BIGINT-safe on both engines)
K_HASHES = 4          # hash functions
NEW_BATCH_MOD = 5     # same corpus/batch split as incremental_dedup


def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bloom_maybe, true_member, verdict) for every new-batch
    document: the Bloom filter's membership answer, the exact truth,
    and the classification ('dup' / 'new' / 'false_positive').

    ``bloom_maybe AND NOT true_member`` rows are the filter's false
    positives — deterministic here, so the driver's value-hash gate
    certifies the sketch bit-for-bit, not just on average.

    Probe corpus: the filter indexes ALL documents; every
    {NEW_BATCH_MOD}-th document is probed twice — verbatim (a true
    member, must hit) and with its last token dropped (a non-member
    twin at doc_id + 1,000,000, hits only on a false positive) — so
    both verdict directions carry real rows on the synthetic tables,
    whose texts are otherwise all-unique."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", F.md5("text").alias("text_md5"))
    probe_base = docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0).select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).filter(F.size("tok") >= 2)
    member = probe_base.select(
        "doc_id", F.md5(F.array_join("tok", " ")).alias("text_md5")
    )
    novel = probe_base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.md5(
            F.array_join(F.slice("tok", 1, F.size("tok") - 1), " ")
        ).alias("text_md5"),
    )
    batch = member.unionByName(novel)

    seeds = F.sequence(F.lit(0), F.lit(K_HASHES - 1))

    def probe_rows(side: DataFrame) -> DataFrame:
        pos = seeded_h32(F.col("i"), F.col("text_md5")) % M_BITS
        return (
            side.select("doc_id", "text_md5", F.explode(seeds).alias("i"))
            .withColumn("pos", pos)
            .select(
                "doc_id",
                "text_md5",
                F.floor(F.col("pos") / WORD).cast("long").alias("word_idx"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD} AS INT))"
                ).alias("mask"),
            )
        )

    # build: O(M_BITS/WORD) word rows; bit_or partial-combines map-side
    words = (
        probe_rows(corpus)
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )

    # probe: batch x K rows vs the broadcast filter
    probed = (
        probe_rows(batch)
        .join(F.broadcast(words), "word_idx", "left")
        .select(
            "doc_id",
            "text_md5",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("bit_set"),
        )
        .groupBy("doc_id", "text_md5")
        .agg(F.bool_and("bit_set").alias("bloom_maybe"))
    )

    # ground truth: exact membership of the batch hash in the corpus
    truth = corpus.select("text_md5").distinct().withColumn(
        "in_corpus", F.lit(True)
    )
    return (
        probed.join(truth, "text_md5", "left")
        .select(
            "doc_id",
            "bloom_maybe",
            F.coalesce("in_corpus", F.lit(False)).alias("true_member"),
            F.when(
                F.col("bloom_maybe") & F.col("in_corpus").isNull(),
                F.lit("false_positive"),
            )
            .when(F.col("bloom_maybe"), F.lit("dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


_POS = seeded_h32_sql("g.i", "text_md5") + f" % {M_BITS}"

BLOOM_INCREMENTAL_DEDUP_SQL = f"""
WITH corpus AS (
  SELECT doc_id, md5(text) AS text_md5 FROM documents
),
probe_base AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, {tokens_sql('text')} AS tok
    FROM documents WHERE doc_id % {NEW_BATCH_MOD} = 0
  ) WHERE len(tok) >= 2
),
batch AS (
  SELECT doc_id, md5(array_to_string(tok, ' ')) AS text_md5 FROM probe_base
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         md5(array_to_string(tok[1:len(tok) - 1], ' ')) AS text_md5
  FROM probe_base
),
corpus_probe AS (
  SELECT ({_POS}) // {WORD} AS word_idx,
         (1::BIGINT << (({_POS}) % {WORD})) AS mask
  FROM corpus, generate_series(0, {K_HASHES - 1}) AS g(i)
),
words AS (
  SELECT word_idx, bit_or(mask) AS bits FROM corpus_probe GROUP BY word_idx
),
batch_probe AS (
  SELECT doc_id, text_md5,
         ({_POS}) // {WORD} AS word_idx,
         (1::BIGINT << (({_POS}) % {WORD})) AS mask
  FROM batch, generate_series(0, {K_HASHES - 1}) AS g(i)
),
probed AS (
  SELECT p.doc_id, p.text_md5,
         bool_and(w.bits IS NOT NULL AND (w.bits & p.mask) = p.mask) AS bloom_maybe
  FROM batch_probe p LEFT JOIN words w ON p.word_idx = w.word_idx
  GROUP BY p.doc_id, p.text_md5
),
truth AS (SELECT DISTINCT text_md5 FROM corpus)
SELECT p.doc_id, p.bloom_maybe,
       t.text_md5 IS NOT NULL AS true_member,
       CASE WHEN p.bloom_maybe AND t.text_md5 IS NULL THEN 'false_positive'
            WHEN p.bloom_maybe THEN 'dup'
            ELSE 'new' END AS verdict
FROM probed p LEFT JOIN truth t ON p.text_md5 = t.text_md5
"""

QUERIES = {
    "bloom_incremental_dedup": (
        bloom_incremental_dedup,
        BLOOM_INCREMENTAL_DEDUP_SQL,
    ),
}
