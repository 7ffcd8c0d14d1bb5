"""Canonical-representative selection per near-dup cluster.

After near-dup pair generation and connected components, at-scale
pipelines (FineWeb, Dolma, RefinedWeb — all public) keep exactly ONE
document per duplicate cluster — the highest-quality member — and drop
the rest.  ``dedup_canonical`` is that keep-one stage: it composes the
existing component labels (ops/dedup.dedup_cluster — pointer-jumping
connected components over the n-gram-Jaccard pairs) with the shared
quality formula (ops/textstats.quality_features, the single definition
every quality-scoring op uses) and emits one row per cluster: the
canonical doc, the integer-scaled quality that won, the cluster size,
and how many duplicates the choice drops.  Documents in no near-dup
pair are their own singleton cluster (kept, dropping nothing), so the
output is a complete keep-set over the corpus, not just the paired
subset.  ``csize``/``dropped`` count every cluster member from
dedup_cluster — including the pair generator's synthesized near-dup
twins, whose ids sit outside the documents table — while the canonical
is always chosen among real documents (every component contains its
twin's original, and min-labelling makes the component id the smallest
REAL doc id).

Scale shape (100 TB):

* Quality is scan-local whole-stage codegen — no Python, nothing but
  (doc_id, q_int) leaves the documents scan.
* The component table is edge-node-sized, but at web scale near-dup
  clusters can cover ~half the corpus (FineWeb reports ~50% removal),
  so it is NOT hinted broadcast — the doc_id equi-join shuffles only
  BIGINT triples on both sides and AQE picks broadcast when the pair
  set happens to be small.
* The winner per cluster is a PARTIAL-AGGREGABLE arg-max —
  ``max(struct(q_int, -doc_id))`` — so map-side combine reduces each
  partition to one candidate row per cluster BEFORE the only
  aggregation shuffle.  A window/rank formulation would shuffle every
  (doc, cluster) row and sort inside each partition; the struct-max
  shuffles at most one row per cluster per partition and never sorts.
* Tie-break is deterministic and engine-neutral: highest q_int, then
  SMALLEST doc_id (max of -doc_id), all-BIGINT so the DuckDB oracle
  replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import load_table, tokens, tokens_sql
from pdf_parser_spark.ops.dedup import DEDUP_CLUSTER_SQL, dedup_cluster
from pdf_parser_spark.ops.textstats import (
    STOPWORDS,
    _hits_sql,
    quality_features,
)


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per duplicate cluster: canonical (kept) doc = arg-max of
    (quality, -doc_id); singletons are their own cluster."""
    comps = dedup_cluster(spark, sf_dir).select(
        "doc_id", "component_id", "csize"
    )
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    stop_ratio, diversity, length_sat = quality_features(tok)
    q_int = F.floor(
        (0.4 * stop_ratio + 0.3 * diversity + 0.3 * length_sat) * 10000.0
        + 0.5
    ).cast("long")
    scored = docs.select("doc_id", q_int.alias("q_int"))
    labeled = scored.join(comps, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").alias("component_id"),
        F.coalesce("csize", F.lit(1).cast("long")).alias("csize"),
        "q_int",
    )
    winner = F.max(
        F.struct(F.col("q_int"), (-F.col("doc_id")).alias("neg_id"))
    )
    return (
        labeled.groupBy("component_id")
        .agg(F.max("csize").alias("csize"), winner.alias("w"))
        .select(
            "component_id",
            "csize",
            (-F.col("w.neg_id")).alias("canonical_doc"),
            F.col("w.q_int").alias("canonical_q"),
            (F.col("csize") - F.lit(1).cast("long")).alias("dropped"),
        )
    )


DEDUP_CANONICAL_SQL = f"""
WITH comp AS ({DEDUP_CLUSTER_SQL}),
tok AS (
  SELECT doc_id, {tokens_sql("text")} AS t FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(floor((0.4 * ({_hits_sql("t", STOPWORDS)}::DOUBLE / len(t))
                   + 0.3 * (len(list_distinct(t))::DOUBLE / len(t))
                   + 0.3 * least(len(t)::DOUBLE / 50.0, 1.0)) * 10000.0
                   + 0.5) AS BIGINT) AS q_int
  FROM tok
),
labeled AS (
  SELECT s.doc_id,
         coalesce(c.component_id, s.doc_id) AS component_id,
         coalesce(c.csize, 1)::BIGINT AS csize,
         s.q_int
  FROM scored s LEFT JOIN comp c ON c.doc_id = s.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY component_id ORDER BY q_int DESC, doc_id ASC
  ) AS rn
  FROM labeled
)
SELECT component_id, csize, doc_id AS canonical_doc,
       q_int AS canonical_q, csize - 1 AS dropped
FROM ranked WHERE rn = 1
"""


QUERIES = {
    "dedup_canonical": (dedup_canonical, DEDUP_CANONICAL_SQL),
}
