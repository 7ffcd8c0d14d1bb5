"""Streaming Count-Min frequency monitor (native streaming aggregation).

The batch twin is :func:`pdf_parser_spark.ops.sketches.heavy_hitters_cms`
— the D×W Count-Min grid.  CMS counters are ADDITIVE, which makes the
streaming spelling the most Spark-native of all the monitors: the grid
IS a streaming ``groupBy(d, cell).count()`` in update mode.  No custom
state function at all — Structured Streaming's aggregation state holds
the D×W running counters (bounded at 256 rows forever), each
micro-batch partial-combines map-side before the exchange exactly like
the batch plan, and update mode emits only the cells a batch touched.

Contrast with streaming/cardinality.py: KMV's min-K merge isn't an
algebraic aggregate Spark ships, so it needs applyInPandasWithState;
CMS is sum-shaped, so the built-in operator is the right tool (UDFs
are the escape hatch, not the default).

The drained stream's final grid is *identical* to the batch grid over
the concatenated input — counts are associative-commutative — which
the batch⇄stream equivalence test pins cell-for-cell, along with the
min-over-rows estimates derived from it.

Hashing stays JVM-side (the shared md5 ``h32`` in codegen); Python
never sees a token.  Sink is the per-batch_id idempotent overwrite
(streaming/job.py pattern); a replayed committed batch still executes
against a noop sink so the aggregation state commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from pdf_parser_spark.ops.common import h32, tokens
from pdf_parser_spark.ops.sketches import CMS_D, CMS_W, cms_cell
from pdf_parser_spark.streaming.job import PAGES_STREAM_SCHEMA, _committed


def stream_heavy_hitters(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: StructType = PAGES_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """Drain all unprocessed page files through the Count-Min monitor;
    each batch's touched (d, cell, cnt) rows land under
    ``{output_path}/grid/batch_id=N`` with CUMULATIVE counts.  Blocks
    until drained."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    cells = (
        pages.select(F.explode(tokens(F.col("text"))).alias("t"))
        .select(h32(F.col("t")).alias("h"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
            "h",
        )
        .select("d", cms_cell("h", "d").alias("cell"))
    )
    grid = cells.groupBy("d", "cell").agg(F.count(F.lit(1)).alias("cnt"))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = f"{output_path}/grid/batch_id={batch_id}"
        if _committed(batch_df.sparkSession, out_dir):
            # replay: still execute the plan so aggregation state commits
            batch_df.write.format("noop").mode("overwrite").save()
            return
        batch_df.write.mode("overwrite").parquet(out_dir)

    query = (
        grid.writeStream.foreachBatch(process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def final_grid(spark: SparkSession, output_path: str) -> DataFrame:
    """Each cell's most recent cumulative count across drained batches
    — the same D×W grid the batch op would build over the union."""
    rows = spark.read.parquet(f"{output_path}/grid")
    latest = rows.groupBy("d", "cell").agg(F.max("batch_id").alias("batch_id"))
    return rows.join(latest, ["d", "cell", "batch_id"]).drop("batch_id")


def estimate_counts(grid: DataFrame, probe_tokens: list[str]) -> DataFrame:
    """(token, cms_est) for each probe token against a (d, cell, cnt)
    grid — min over the token's D cells, exactly the batch estimator."""
    spark = grid.sparkSession
    probes = (
        spark.createDataFrame([(t,) for t in probe_tokens], "token string")
        .withColumn("h", h32(F.col("token")))
        .select(
            "token",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
            "h",
        )
        .select("token", "d", cms_cell("h", "d").alias("cell"))
    )
    # LEFT join: an arbitrary probe token may hit cells no stream token
    # ever touched — an absent (d, cell) row means a zero counter, so
    # the CMS min for such a token is 0, not "drop the token" (the
    # batch twin probes only corpus top-K tokens, whose cells always
    # exist; here the caller chooses the probes).
    return (
        probes.join(F.broadcast(grid), ["d", "cell"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
