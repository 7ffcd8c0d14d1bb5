"""SQL-expressible twins of the extraction job-layer patterns
(SURVEY.md §3.4): heavy-tail classification, lineage aggregation,
resume anti-join, skew bucketing.

The production versions in :mod:`pdf_parser_spark.spark.job` run over
the pages table with ``spark_partition_id()`` / ``xxhash64`` (not
SQL-portable); these twins express the identical plan shapes over the
``documents`` table with the cross-engine ``h32`` hash so the driver
can value-check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import h32, h32_sql, load_table

HEAVY_CHARS = 450       # n_chars boundary between partition classes
SKEW_BUCKETS = 32
RESUME_MOD = 3          # committed set = doc_id % 3 == 0


def heavy_tail_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-size partition-class split (job.classify_size twin):
    per-class doc counts and byte totals — the routing decision that
    keeps P99 task time flat at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "size_class",
            F.when(F.col("n_chars") > HEAVY_CHARS, F.lit("heavy")).otherwise(
                F.lit("normal")
            ),
        )
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_chars").alias("max_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


HEAVY_TAIL_CLASSES_SQL = f"""
SELECT CASE WHEN n_chars > {HEAVY_CHARS} THEN 'heavy' ELSE 'normal' END AS size_class,
       count(*) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(n_chars) AS max_chars,
       min(doc_id) AS first_doc
FROM documents
GROUP BY 1
"""


def lineage_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lineage/metrics rows (job.lineage twin): row counts,
    char totals, id ranges — the per-partition audit record."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.count_distinct("lang").alias("n_langs"),
    )


LINEAGE_BY_SOURCE_SQL = """
SELECT source,
       count(*) AS row_count,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
"""


def resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume path (job.resume_filter twin): anti-join the source
    against the committed set; AQE turns this into a broadcast
    anti-join when the committed side is small."""
    docs = load_table(spark, sf_dir, "documents")
    committed = docs.filter(F.col("doc_id") % RESUME_MOD == 0).select("doc_id")
    return (
        docs.join(committed, on="doc_id", how="left_anti")
        .select("doc_id", "n_chars", "lang")
    )


RESUME_ANTI_JOIN_SQL = f"""
SELECT doc_id, n_chars, lang
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % {RESUME_MOD} = 0)
"""


def skew_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-by-key layout audit (job.run_extract's
    repartition(xxhash64) twin, spelled with the portable h32): docs
    and bytes per bucket — near-uniform by construction, the property
    that makes the shuffle skew-free."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = h32(F.col("doc_id").cast("string")) % SKEW_BUCKETS
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SKEW_BUCKETS_SQL = f"""
SELECT ({h32_sql("doc_id::VARCHAR")} % {SKEW_BUCKETS}) AS bucket,
       count(*) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
"""


QUERIES = {
    "heavy_tail_classes": (heavy_tail_classes, HEAVY_TAIL_CLASSES_SQL),
    "lineage_by_source": (lineage_by_source, LINEAGE_BY_SOURCE_SQL),
    "resume_anti_join": (resume_anti_join, RESUME_ANTI_JOIN_SQL),
    "skew_buckets": (skew_buckets, SKEW_BUCKETS_SQL),
}
