"""Explicit salt-on-skew join: the 100 TB hot-key mitigation, as an
oracle-checked operator.

The extraction job routes payload-size skew (spark/job.py); this op
demonstrates the OTHER skew class — a hot JOIN KEY.  A derived fact
table concentrates ~70% of the events on one key; joined naively with
a shuffle join, every hot-key row lands in one task and the stage's
P99 is that one straggler.  The salted plan spreads the hot key over
``SALT_N`` sub-keys (fact side: deterministic hash salt; dim side:
replicated ``SALT_N`` ways with ``explode(sequence(...))``), joins on
``(key, salt)``, and re-aggregates.  The join is hinted
``shuffle_hash`` so the executed plan actually exercises the salted
exchange (Spark would otherwise broadcast this sf-sized dim and mask
the technique; at 100 TB the dim side is taken to be
beyond-broadcast).

The oracle is the plain UNSALTED join + rollup — proving the salted
rewrite is result-invariant, which is the whole contract of salting.

AQE's skew-join handles this automatically for sort-merge joins when
partition-size stats expose the skew; explicit salting remains the
portable fix when the skew is in a hash aggregate above the join or
AQE's thresholds miss it (documented trade-off, PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import h32, h32_sql, load_table

SALT_N = 8        # hot-key spread factor
DIM_KEYS = 50     # derived dim cardinality
HOT_FRACTION_MOD = 10, 7  # user_id % 10 < 7  ->  key 0 (~70% of facts)


def _fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mod, hot = HOT_FRACTION_MOD
    key = F.when(F.col("user_id") % mod < hot, F.lit(0)).otherwise(
        F.col("user_id") % DIM_KEYS
    )
    return ev.select(
        "event_id",
        key.cast("long").alias("page_key"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )


def _dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select((F.col("doc_id") % DIM_KEYS).alias("page_key"), "n_chars")
        .groupBy("page_key")
        .agg(
            F.count(F.lit(1)).alias("dim_docs"),
            F.sum("n_chars").alias("dim_chars"),
        )
    )


def salted_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rollup of the fact⋈dim join, computed through the
    salted rewrite; value-identical to the plain join (the oracle)."""
    fact = _fact(spark, sf_dir).withColumn(
        "salt", F.pmod(h32(F.col("event_id").cast("string")), F.lit(SALT_N))
    )
    dim = _dim(spark, sf_dir).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    joined = fact.hint("shuffle_hash").join(dim, ["page_key", "salt"])
    return joined.groupBy("page_key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("cents"),
        F.first("dim_docs").alias("dim_docs"),
        F.first("dim_chars").alias("dim_chars"),
    )


_MOD, _HOT = HOT_FRACTION_MOD

SALTED_JOIN_STATS_SQL = f"""
WITH fact AS (
  SELECT event_id,
         CASE WHEN user_id % {_MOD} < {_HOT} THEN 0
              ELSE user_id % {DIM_KEYS} END AS page_key,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), dim AS (
  SELECT doc_id % {DIM_KEYS} AS page_key,
         count(*) AS dim_docs,
         CAST(sum(n_chars) AS BIGINT) AS dim_chars
  FROM documents
  GROUP BY 1
)
SELECT f.page_key,
       count(*) AS n_events,
       CAST(sum(f.cents) AS BIGINT) AS cents,
       min(d.dim_docs) AS dim_docs,
       min(d.dim_chars) AS dim_chars
FROM fact f JOIN dim d USING (page_key)
GROUP BY 1
"""


QUERIES = {
    "salted_join_stats": (salted_join_stats, SALTED_JOIN_STATS_SQL),
}
