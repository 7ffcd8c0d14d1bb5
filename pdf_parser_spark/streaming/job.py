"""Continuous-ingest variant of the extraction job (Structured
Streaming file source).

The reference is a batch-only, document-at-a-time pipeline (SURVEY.md
§2.11: no streaming semantics), so this is an *additional* capability,
not a port: a crawl drops new page files into a landing directory (or
an Iceberg table accumulates snapshots) and extraction keeps up
incrementally instead of re-planning a 10^12-row batch.

Design:

* **File source + ``availableNow``** — each run drains whatever landed
  since the last checkpoint and stops; the checkpoint's file log IS
  the resume state (exactly-once per input file), complementing the
  batch job's snapshot/anti-join resume (spark/table.py) which
  dedups at the url level.
* **``foreachBatch`` reuses the batch plan** — every micro-batch runs
  the SAME ``run_extract`` (skew-routed, spans, error columns) and the
  SAME ``lineage`` aggregation, so streaming and batch cannot drift:
  one extraction code path, two drivers.  Per-batch lineage rows are
  appended next to the output with the batch id stamped on them.
* **No stateful operators** — extraction is per-row, so there is no
  watermark/state-store cost; the only shuffle per micro-batch is the
  heavy-class spread, same as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_parser_spark.spark.job import lineage, run_extract

PAGES_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", LongType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    fmt: str = "txt",
    threshold: int = 1 << 20,
    schema: StructType = PAGES_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """Drain all unprocessed page files from ``input_path`` through the
    batch extraction plan into ``output_path``; blocks until done.

    Returns the finished ``StreamingQuery`` (call again later to pick
    up newly landed files — the checkpoint remembers progress).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = run_extract(batch_df, fmt=fmt, threshold=threshold)
        # extracted feeds two sinks; without a materialization point the
        # whole UDF plan would run once per sink
        extracted = extracted.persist()
        try:
            extracted.write.mode("append").parquet(f"{output_path}/extracted")
            (
                lineage(extracted)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(f"{output_path}/lineage")
            )
        finally:
            extracted.unpersist()

    query = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
