"""Theta-sketch batch novelty: how much of the new dump's content is
already in the corpus, per language, at sketch cost.

"Is dump N worth ingesting?" is a set question over content units —
here distinct word-3-gram hashes — whose exact answer at 10^12 docs is
a corpus-wide distinct shuffle.  The KMV/theta estimator (Bar-Yossef
et al. RANDOM'02; the union/intersection form is the Theta Sketch
Framework, Dasgupta et al. 2016 — all public method) answers it from
two K-sized sketches: keep the K smallest h32 per side, set
theta = min of the two sketch thresholds, and every count below theta
scales by HASH_SPACE/theta.  Like ops/sketches.py's cardinality_kmv
(whose K and hash family this reuses), the md5-based h32 order
statistic is deterministic and engine-identical, so union,
intersection, and jaccard estimates are value-hash gradable against
DuckDB — integer arithmetic throughout, integral DIV only.

When a side holds fewer than K distinct hashes its sketch IS the exact
set (theta = HASH_SPACE) and every estimate below collapses to the
exact count — both branches are live at the test scales.

Scale: the (lang, side, h) distinct pre-aggregation partial-combines
map-side; the per-side ranking sorts distinct hashes only; everything
downstream of the sketch filter is O(langs × K) rows, and the stats
frame joins back by broadcast.

Plan shape: the corpus is scanned ONCE.  A naive four-branch
formulation (stats / new-side / old-side / union, each re-filtering
the ranked sketch) recomputes the scan+distinct+rank pipeline per
branch — Catalyst pushes each branch's `side` predicate below the
rank window, so the exchange subtrees stop being equal and
ReusedExchange can't dedup them (measured: 10 parquet scans at
sf0.001).  Instead the two K-sketches collapse to one per-(lang, h)
flags frame (in_new, in_old) — O(langs × 2K) rows — which is
persisted; the per-lang stats aggregate, the theta filter, and the
union/intersection counts all derive from that in-memory relation, so
the only corpus-sized work is the single distinct pre-aggregation.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from pdf_parser_spark.ops.common import (
    h32,
    h32_sql,
    load_table,
    shingles,
    shingles_sql,
    tokens,
    tokens_sql,
)
from pdf_parser_spark.ops.dedup import SHINGLE_N
from pdf_parser_spark.ops.filtering import NEW_BATCH_MOD
from pdf_parser_spark.ops.sketches import HASH_SPACE, KMV_K

PPM = 1_000_000


def sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per lang: theta-sketch estimates of the new batch's distinct
    3-gram count, the corpus's, their union/intersection, and the
    jaccard in integer ppm."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = (
        docs.select(
            "lang",
            (F.col("doc_id") % NEW_BATCH_MOD == 0)
            .cast("long")
            .alias("side"),
            F.explode(shingles(tokens(F.col("text")), SHINGLE_N)).alias("g"),
        )
        .select("lang", "side", h32(F.col("g")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("lang", "side").orderBy("h")
    sk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    # Collapse the two K-sketches into one per-(lang, h) flags frame —
    # O(langs x 2K) rows, the single cut point the whole rest of the
    # query derives from (persisted: it is re-scanned for the stats
    # aggregate and the theta-filtered counts).
    flags = (
        sk.groupBy("lang", "h")
        .agg(
            F.max("side").alias("in_new"),
            F.max(1 - F.col("side")).alias("in_old"),
        )
        .persist()
    )
    # Materialize ONCE before the plan fans out (stats is referenced
    # both as the broadcast theta frame and as the output's left side;
    # concurrent first-computation of an unmaterialized cached relation
    # is not deduped — the dedup_cluster finding, PLANS.md §12).  One
    # cheap action pins the corpus-sized pipeline to a single scan.
    flags.count()
    # Per-side sketch size and K-th hash from the flags frame: the
    # sketch rows per side are exactly the flagged rows, so
    # n_side = sum(flag) and kth = max(h where flag).  theta per side
    # is the K-th hash, or the whole space when the sketch is exact
    # (n < K).
    def _theta(n, kth):
        return F.when(
            F.col(n) < KMV_K, F.lit(HASH_SPACE).cast("long")
        ).otherwise(F.coalesce(F.col(kth), F.lit(HASH_SPACE).cast("long")))

    stats = (
        flags.groupBy("lang")
        .agg(
            F.sum("in_new").alias("n_new"),
            F.max(F.when(F.col("in_new") == 1, F.col("h"))).alias("kth_new"),
            F.sum("in_old").alias("n_old"),
            F.max(F.when(F.col("in_old") == 1, F.col("h"))).alias("kth_old"),
        )
        .na.fill({"n_new": 0, "n_old": 0, "kth_new": 0, "kth_old": 0})
        .withColumn("theta_new", _theta("n_new", "kth_new"))
        .withColumn("theta_old", _theta("n_old", "kth_old"))
        .withColumn("theta", F.least("theta_new", "theta_old"))
    )

    counts = (
        flags.join(F.broadcast(stats.select("lang", "theta")), "lang")
        .filter(F.col("h") < F.col("theta"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_union"),
            F.sum(F.col("in_new") * F.col("in_old")).alias("n_common"),
        )
    )

    est = (
        lambda n, kth: f"CASE WHEN {n} < {KMV_K} THEN {n}"
        f" ELSE ({KMV_K - 1} * CAST({HASH_SPACE} AS BIGINT)) DIV {kth} END"
    )
    out = (
        stats.join(counts, "lang", "left")
        .na.fill({"n_common": 0, "n_union": 0})
        .selectExpr(
            "lang",
            f"{est('n_new', 'kth_new')} AS est_new",
            f"{est('n_old', 'kth_old')} AS est_old",
            f"n_union * CAST({HASH_SPACE} AS BIGINT) DIV theta AS est_union",
            f"n_common * CAST({HASH_SPACE} AS BIGINT) DIV theta"
            " AS est_intersection",
            "theta",
        )
        .selectExpr(
            "lang",
            "est_new",
            "est_old",
            "est_union",
            "est_intersection",
            f"CASE WHEN est_union > 0 THEN est_intersection * {PPM}"
            " DIV est_union ELSE 0 END AS jaccard_ppm",
            # effective sampling threshold — HASH_SPACE/theta is the
            # per-hash scale factor, i.e. the resolution floor of the
            # intersection estimate; surfacing it lets a consumer (and
            # the quality test) judge how coarse the estimate is
            "theta",
        )
    )
    return out


SKETCH_OVERLAP_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, {tokens_sql("text")} AS tok FROM documents
),
hashed AS (
  SELECT DISTINCT lang,
         CASE WHEN doc_id % {NEW_BATCH_MOD} = 0 THEN 1 ELSE 0 END AS side,
         {h32_sql("u.g")} AS h
  FROM toks, unnest({shingles_sql("tok", 3)}) AS u(g)
),
ranked AS (
  SELECT lang, side, h,
         row_number() OVER (PARTITION BY lang, side ORDER BY h) AS rn
  FROM hashed
),
sk AS (SELECT lang, side, h FROM ranked WHERE rn <= {KMV_K}),
per_side AS (
  SELECT lang, side, count(*)::BIGINT AS n_sk, max(h)::BIGINT AS kth,
         CASE WHEN count(*) < {KMV_K} THEN {HASH_SPACE}::BIGINT
              ELSE max(h)::BIGINT END AS theta_side
  FROM sk GROUP BY lang, side
),
stats AS (
  SELECT lang,
         coalesce(max(CASE WHEN side = 1 THEN n_sk END), 0) AS n_new,
         coalesce(max(CASE WHEN side = 1 THEN kth END), 0) AS kth_new,
         coalesce(max(CASE WHEN side = 1 THEN theta_side END),
                  {HASH_SPACE}::BIGINT) AS theta_new,
         coalesce(max(CASE WHEN side = 0 THEN n_sk END), 0) AS n_old,
         coalesce(max(CASE WHEN side = 0 THEN kth END), 0) AS kth_old,
         coalesce(max(CASE WHEN side = 0 THEN theta_side END),
                  {HASH_SPACE}::BIGINT) AS theta_old,
         least(coalesce(max(CASE WHEN side = 1 THEN theta_side END),
                        {HASH_SPACE}::BIGINT),
               coalesce(max(CASE WHEN side = 0 THEN theta_side END),
                        {HASH_SPACE}::BIGINT)) AS theta
  FROM per_side GROUP BY lang
),
common AS (
  SELECT a.lang, count(*)::BIGINT AS n_common
  FROM sk a JOIN sk b
    ON a.lang = b.lang AND a.h = b.h AND a.side = 1 AND b.side = 0
  JOIN stats s ON s.lang = a.lang
  WHERE a.h < s.theta
  GROUP BY a.lang
),
union_below AS (
  SELECT u.lang, count(*)::BIGINT AS n_union
  FROM (SELECT DISTINCT lang, h FROM sk) u
  JOIN stats s ON s.lang = u.lang
  WHERE u.h < s.theta
  GROUP BY u.lang
),
est AS (
  SELECT s.lang,
         CASE WHEN s.n_new < {KMV_K} THEN s.n_new
              ELSE ({KMV_K - 1} * {HASH_SPACE}::BIGINT) // s.kth_new
         END AS est_new,
         CASE WHEN s.n_old < {KMV_K} THEN s.n_old
              ELSE ({KMV_K - 1} * {HASH_SPACE}::BIGINT) // s.kth_old
         END AS est_old,
         coalesce(ub.n_union, 0) * {HASH_SPACE}::BIGINT // s.theta
           AS est_union,
         coalesce(c.n_common, 0) * {HASH_SPACE}::BIGINT // s.theta
           AS est_intersection
  FROM stats s
  LEFT JOIN common c ON c.lang = s.lang
  LEFT JOIN union_below ub ON ub.lang = s.lang
)
SELECT e.lang, e.est_new::BIGINT AS est_new, e.est_old::BIGINT AS est_old,
       e.est_union::BIGINT AS est_union,
       e.est_intersection::BIGINT AS est_intersection,
       (CASE WHEN e.est_union > 0
             THEN e.est_intersection * {PPM} // e.est_union
             ELSE 0 END)::BIGINT AS jaccard_ppm,
       s.theta::BIGINT AS theta
FROM est e JOIN stats s ON s.lang = e.lang
"""


QUERIES = {
    "sketch_overlap": (sketch_overlap, SKETCH_OVERLAP_SQL),
}
