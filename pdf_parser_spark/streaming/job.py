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
  the resume state (each input file enters exactly one micro-batch),
  complementing the batch job's snapshot/anti-join resume
  (spark/table.py) which dedups at the url level.
* **``foreachBatch`` reuses the batch plan** — every micro-batch runs
  the SAME ``run_extract`` (skew-routed, spans, error columns) and the
  SAME ``lineage`` aggregation, so streaming and batch cannot drift:
  one extraction code path, two drivers.
* **Idempotent sink → end-to-end exactly-once.** ``foreachBatch``
  alone is only at-least-once: if the driver dies between the sink
  write and the checkpoint commit, the retried micro-batch (same
  ``batch_id``, same rows — availableNow planning is deterministic
  from the file log) runs again.  Each batch therefore writes to a
  ``batch_id=N`` hive partition with ``mode("overwrite")`` scoped to
  that directory: a replay overwrites its own partial output instead
  of appending duplicates, and a ``_SUCCESS``-marker check skips the
  recompute entirely when the batch already committed.
* **No stateful operators** — extraction is per-row, so there is no
  watermark/state-store cost; the only shuffle per micro-batch is the
  heavy-class spread, same as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pdf_parser_spark.spark.job import lineage, run_extract

PAGES_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _committed(spark: SparkSession, directory: str) -> bool:
    """True when ``directory`` holds a completed parquet write
    (Hadoop ``_SUCCESS`` marker) — works on any Hadoop filesystem."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{directory}/_SUCCESS")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


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
        spark_b = batch_df.sparkSession
        out_dir = f"{output_path}/extracted/batch_id={batch_id}"
        lin_dir = f"{output_path}/lineage/batch_id={batch_id}"
        if _committed(spark_b, out_dir) and _committed(spark_b, lin_dir):
            return  # replayed batch already fully committed — skip
        extracted = run_extract(batch_df, fmt=fmt, threshold=threshold)
        # extracted feeds two sinks; without a materialization point the
        # whole UDF plan would run once per sink
        extracted = extracted.persist()
        try:
            # overwrite scoped to this batch's own partition dir makes
            # a replay after a torn write idempotent
            extracted.write.mode("overwrite").parquet(out_dir)
            lineage(extracted).write.mode("overwrite").parquet(lin_dir)
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
