"""Watermarked event-time windowed aggregation (built-in streaming
window, completing the streaming matrix alongside the stateless
extraction stream and the custom-stateful sessionizer).

Tumbling event-time windows over the events stream with a watermark:
per (window, event_type) counts and value rollups.  This is the
built-in-operator counterpart to
:mod:`pdf_parser_spark.streaming.sessionize` — when the semantics fit
Spark's windowed aggregation, the state store, late-data dropping, and
partial-aggregation plumbing come for free and run JVM-side.

Semantics pinned by tests/test_streaming_windows.py:

* a drained ``availableNow`` run over time-ordered landing files
  produces exactly the batch groupBy's window rows (equivalence);
* late-data handling is Spark's documented BEST-EFFORT drop: a late
  row whose window is still resident in the state store merges into
  it (verified: same-batch late row, ``numRowsDroppedByWatermark=0``),
  while a late row arriving after its window was evicted is dropped
  (verified: two-batches-late row, drop counter = 1) — a batch
  recompute would instead include it.  At 100 TB the watermark bounds
  state-store size: without it every window ever seen stays resident.

Sink: append-mode ``foreachBatch`` into ``batch_id=N`` partitions
(idempotent-replay pattern shared with the other streaming jobs);
append emits a window only once its watermark passes, so re-reads
never see a partially-updated window.  ``availableNow`` advances the
watermark between micro-batches but not after the last one, so the
final still-open windows are flushed by a terminal empty drain (the
standard flush idiom) — or read unioned with the batch tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.streaming.sessionize import (
    EVENTS_STREAM_SCHEMA,
    _committed,
)

WINDOW = "1 day"
WATERMARK = "2 days"


def _windowed(events: DataFrame) -> DataFrame:
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        # watermarks need TIMESTAMP (LTZ); the cast interprets the NTZ
        # value in the session tz — identical in the batch twin, so the
        # window bucketing agrees whatever the tz is
        events.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", WATERMARK)
        .groupBy(F.window("ts_ltz", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def stream_window_counts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
):
    """Drain event files through the watermarked windowed aggregation;
    closed windows land under ``{output_path}/windows/batch_id=N``."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_path)
    windows = _windowed(events)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = f"{output_path}/windows/batch_id={batch_id}"
        if _committed(batch_df.sparkSession, out_dir):
            # replayed committed batch: still execute the watermarked
            # aggregation (noop sink) so window/watermark state commits
            batch_df.write.format("noop").mode("overwrite").save()
            return
        batch_df.write.mode("overwrite").parquet(out_dir)

    query = (
        windows.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def batch_window_counts(spark: SparkSession, input_path: str) -> DataFrame:
    """The batch twin: same window/rollup over the same files, no
    watermark (batch sees everything)."""
    events = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(input_path)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        events.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts_ltz", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
