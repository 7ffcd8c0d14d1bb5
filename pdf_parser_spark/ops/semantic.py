"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space with k-means, then
prune semantically-near-duplicate pairs INSIDE each cluster only —
never all-pairs.

Composition of two already-certified pieces:

* the exact-integer Lloyd's k-means recurrence from
  :mod:`pdf_parser_spark.ops.clustering` (same ``KM_K``/``KM_ITERS``/
  ``KM_SCALE`` constants and update arithmetic, run here over the
  twin-injected embedding corpus so ground-truth near-dups exist), and
* the sequential-fold cosine arithmetic from
  :mod:`pdf_parser_spark.ops.dedup` (norms precomputed per vector,
  one fold per candidate pair, round-4 so both engines compare the
  identical double).

Verdict rule (the SemDeDup keep-policy, made deterministic): within a
pair with cosine >= ``SEM_THRESHOLD``, prune the vector CLOSER to its
cluster centroid (smaller exact-integer squared distance — SemDeDup
keeps low-centroid-similarity examples); ties prune the larger vec_id.

Scale: the pair join is keyed on ``cluster_id`` — the candidate space
is cut K-fold and nothing vector-sized crosses a shuffle except the
one within-cluster pair join of (vec_id, v, nv, dist) rows; at corpus
scale K grows with the corpus (SemDeDup uses K ~ sqrt(N)) so the
per-cluster pair count stays bounded.  The assignment pass is the
narrow Arrow map from the k-means op; the loser/prune joins move only
(vec_id, flag) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from pdf_parser_spark.ops.clustering import KM_ITERS, KM_K, KM_SCALE
from pdf_parser_spark.ops.dedup import (
    EMB_CORPUS_SQL,
    _SEQ_DOT_AB,
    _SEQ_NORM,
    _emb_corpus,
)
from pdf_parser_spark.ops.common import roundn, roundn_sql

SEM_THRESHOLD = 0.95  # semantic (not near-identical) duplicate bar

_ASSIGN_SCHEMA = StructType(
    [StructField("cluster_id", LongType()), StructField("dist", LongType())]
)


def _assign_keep(vecs: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment preserving the caller's columns —
    same argmin/tie rule as clustering._assign (first minimum ==
    lowest cluster id for ascending cluster order)."""
    ids = np.array([c for c, _ in cents], dtype=np.int64)
    mat = np.array([v for _, v in cents], dtype=np.int64)

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def nearest(qv: pd.Series) -> pd.DataFrame:
        x = np.stack(qv.to_numpy())
        d = ((x[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
        j = d.argmin(axis=1)
        return pd.DataFrame(
            {"cluster_id": ids[j], "dist": d[np.arange(len(j)), j]}
        )

    return vecs.withColumn("a", nearest("qv")).select(
        *vecs.columns, "a.cluster_id", "a.dist"
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster_id, dist, pruned) over the twin-injected
    embedding corpus after KM_ITERS exact-integer Lloyd's rounds and
    intra-cluster cosine pruning at SEM_THRESHOLD."""
    corpus = _emb_corpus(spark, sf_dir).withColumn(
        "qv",
        F.transform("v", lambda x: F.floor(x * KM_SCALE).cast("long")),
    )
    # identical Lloyd's recurrence as ops/clustering.py, over this
    # corpus: init = quantized vectors of vec_id < KM_K (twin ids are
    # >= 1e6, so the init set equals the raw table's)
    cents = sorted(
        (r.vec_id, list(r.qv))
        for r in corpus.filter(F.col("vec_id") < KM_K)
        .select("vec_id", "qv")
        .collect()
    )
    dims = len(cents[0][1])
    for _ in range(KM_ITERS):
        assigned = _assign_keep(corpus.select("vec_id", "qv"), cents)
        rows = (
            assigned.select(
                "cluster_id", F.posexplode("qv").alias("dim", "val")
            )
            .groupBy("cluster_id", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .selectExpr("cluster_id", "dim", "s div n AS cv")
            .collect()
        )
        by_cluster: dict[int, list[int]] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, [0] * dims)[r.dim] = r.cv
        cents = sorted(by_cluster.items())

    nv = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    assigned = (
        _assign_keep(corpus.select("vec_id", "v", "qv"), cents)
        .select("vec_id", "v", "cluster_id", "dist")
        .withColumn("nv", nv)
        .persist()
    )
    # materialize ONCE before the self-join scans it from both sides:
    # concurrent first-computation of a cached relation is not deduped
    # (the round-4 dedup_cluster probe-thinning finding), so without
    # this action the final-assignment narrow map would run 2-3x
    assigned.count()

    a, b = assigned.alias("a"), assigned.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = roundn(dot / (F.col("a.nv") * F.col("b.nv")), 4)
    loser = (
        F.when(F.col("a.dist") < F.col("b.dist"), F.col("a.vec_id"))
        .when(F.col("b.dist") < F.col("a.dist"), F.col("b.vec_id"))
        .otherwise(F.greatest(F.col("a.vec_id"), F.col("b.vec_id")))
    )
    pruned_ids = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= SEM_THRESHOLD)
        .select(loser.alias("vec_id"))
        .distinct()
        .withColumn("pruned", F.lit(True))
    )
    return (
        assigned.select("vec_id", "cluster_id", "dist")
        .join(pruned_ids, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            "dist",
            F.coalesce("pruned", F.lit(False)).alias("pruned"),
        )
    )


def _sem_sql() -> str:
    """EMB twin corpus -> the identical unrolled Lloyd's CTEs (same
    shape as clustering._kmeans_sql, sourced from the corpus CTE) ->
    within-cluster pair pruning."""
    sql = (
        EMB_CORPUS_SQL
        + f""",
vlong AS (
  SELECT vec_id,
         unnest(list_transform(v,
                x -> CAST(floor(x * {KM_SCALE}) AS BIGINT))) AS val,
         unnest(generate_series(1, len(v))) AS dim
  FROM corpus
), cent_0 AS (
  SELECT vec_id AS cluster_id, dim, val AS cv
  FROM vlong WHERE vec_id < {KM_K}
)"""
    )
    for step in range(1, KM_ITERS + 1):
        sql += f""", dist_{step} AS (
  SELECT v.vec_id, c.cluster_id,
         sum((v.val - c.cv) * (v.val - c.cv)) AS dist
  FROM vlong v JOIN cent_{step - 1} c USING (dim)
  GROUP BY 1, 2
), best_{step} AS (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, cluster_id ASC) AS rn
  FROM dist_{step}
), cent_{step} AS (
  SELECT b.cluster_id, v.dim, sum(v.val) // count(*) AS cv
  FROM best_{step} b JOIN vlong v USING (vec_id)
  WHERE b.rn = 1
  GROUP BY 1, 2
)"""
    final = KM_ITERS + 1
    cos = roundn_sql(f"{_SEQ_DOT_AB} / (a.nv * b.nv)", 4)
    sql += f""", dist_{final} AS (
  SELECT v.vec_id, c.cluster_id,
         sum((v.val - c.cv) * (v.val - c.cv)) AS dist
  FROM vlong v JOIN cent_{KM_ITERS} c USING (dim)
  GROUP BY 1, 2
), assigned AS (
  SELECT vec_id, cluster_id, CAST(dist AS BIGINT) AS dist
  FROM (SELECT vec_id, cluster_id, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cluster_id ASC) AS rn
        FROM dist_{final})
  WHERE rn = 1
), normed AS (
  SELECT c.vec_id, c.v, s.cluster_id, s.dist, {_SEQ_NORM} AS nv
  FROM corpus c JOIN assigned s USING (vec_id)
), losers AS (
  SELECT DISTINCT
         CASE WHEN a.dist < b.dist THEN a.vec_id
              WHEN b.dist < a.dist THEN b.vec_id
              ELSE greatest(a.vec_id, b.vec_id) END AS vec_id
  FROM normed a JOIN normed b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {cos} >= {SEM_THRESHOLD}
)
SELECT s.vec_id, s.cluster_id, s.dist,
       (l.vec_id IS NOT NULL) AS pruned
FROM assigned s LEFT JOIN losers l USING (vec_id)
"""
    return sql


DEDUP_SEMANTIC_SQL = _sem_sql()

QUERIES = {
    "dedup_semantic": (dedup_semantic, DEDUP_SEMANTIC_SQL),
}
