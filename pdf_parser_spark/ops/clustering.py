"""Iterative embedding clustering: exact-integer Lloyd's k-means.

The one algorithm class the ops suite hadn't covered: an *iterative*
distributed algorithm (assignment ⇄ centroid update), the training
loop behind IVF cell construction (ops/similarity.py keys its probe
join on centroids that, at scale, come from exactly this job).

Why exact integers: floating-point k-means is not engine-comparable —
mean() accumulates in engine-specific order, so centroids drift by
ulps and assignments near a Voronoi boundary flip.  Here every vector
is quantized once (``floor(x * 10⁴)`` per dim — float32→double
widening and the multiply round identically everywhere), distances are
BIGINT sums of squares (max ≈ 2.6e10 × dims, far from overflow), and
centroid updates use truncating BIGINT division (Spark ``div`` ==
DuckDB ``//`` on integers, verified on negatives).  Both engines
therefore run the *identical* deterministic recurrence, and the oracle
is value-exact — a property float k-means cannot have.

Scale design (classic distributed Lloyd's, MLlib-shaped):

* assignment is a **narrow** Arrow-vectorized pass — the K×D centroid
  matrix is a broadcast-sized literal captured in the UDF (numpy int64
  squared-distance argmin; ties break to the lowest cluster id, which
  ``np.argmin``'s first-minimum gives for ascending cluster order);
* the update is ONE shuffle of ``(cluster, dim)`` partial sums
  (posexplode → map-side-combined sum/count), K×D rows to the driver
  per iteration — never the vectors;
* empty clusters drop out of the groupBy in both engines identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from pdf_parser_spark.ops.common import load_table

KM_K = 8           # clusters; init = quantized vectors of vec_id < K
KM_ITERS = 2       # assignment/update rounds before the final assign
KM_SCALE = 10_000  # quantization: floor(x * KM_SCALE) per dimension

_ASSIGN_SCHEMA = StructType(
    [StructField("cluster_id", LongType()), StructField("dist", LongType())]
)


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KM_SCALE).cast("long"),
        ).alias("qv"),
    )


def _assign(vecs: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment, Arrow-vectorized (narrow)."""
    ids = np.array([c for c, _ in cents], dtype=np.int64)
    mat = np.array([v for _, v in cents], dtype=np.int64)  # (K, D)

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def nearest(qv: pd.Series) -> pd.DataFrame:
        x = np.stack(qv.to_numpy())  # (n, D) int64
        d = ((x[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)  # (n, K)
        j = d.argmin(axis=1)  # first minimum == lowest cluster id
        return pd.DataFrame(
            {"cluster_id": ids[j], "dist": d[np.arange(len(j)), j]}
        )

    a = vecs.withColumn("a", nearest("qv"))
    return a.select("vec_id", "qv", "a.cluster_id", "a.dist")


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final (vec_id → cluster_id, squared-distance) assignment after
    ``KM_ITERS`` exact-integer Lloyd's rounds from the deterministic
    vec_id<K init."""
    vecs = _qvecs(spark, sf_dir)
    cents = sorted(
        (r.vec_id, list(r.qv))
        for r in vecs.filter(F.col("vec_id") < KM_K).collect()
    )
    for _ in range(KM_ITERS):
        assigned = _assign(vecs, cents)
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
            by_cluster.setdefault(r.cluster_id, [0] * len(cents[0][1]))[
                r.dim
            ] = r.cv
        cents = sorted(by_cluster.items())
    return _assign(vecs, cents).select("vec_id", "cluster_id", "dist")


def _kmeans_sql() -> str:
    """The identical recurrence, unrolled as DuckDB CTEs (long format:
    parallel unnests zip value and 1-based dim)."""
    sql = f"""
WITH vlong AS (
  SELECT vec_id,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT))) AS val,
         unnest(generate_series(1, len(embedding))) AS dim
  FROM embeddings
), cent_0 AS (
  SELECT vec_id AS cluster_id, dim, val AS cv
  FROM vlong WHERE vec_id < {KM_K}
)"""
    step = 0
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
    sql += f""", dist_{final} AS (
  SELECT v.vec_id, c.cluster_id,
         sum((v.val - c.cv) * (v.val - c.cv)) AS dist
  FROM vlong v JOIN cent_{KM_ITERS} c USING (dim)
  GROUP BY 1, 2
), best_{final} AS (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, cluster_id ASC) AS rn
  FROM dist_{final}
)
SELECT vec_id, cluster_id, CAST(dist AS BIGINT) AS dist
FROM best_{final} WHERE rn = 1
"""
    return sql


KMEANS_EMBEDDINGS_SQL = _kmeans_sql()


QUERIES = {
    "kmeans_embeddings": (kmeans_embeddings, KMEANS_EMBEDDINGS_SQL),
}
