"""Streaming distinct-cardinality monitor (`applyInPandasWithState`).

The batch twin is :func:`pdf_parser_spark.ops.sketches.cardinality_kmv`
— the KMV k-minimum-values order-statistic sketch.  KMV is exactly the
right sketch for continuous monitoring because it is **mergeable**:
the union's K smallest hashes are a subset of (state's K smallest ∪
batch's hashes), so per-key state is a bounded ``K``-element array no
matter how many batches or how hot the key, and the drained stream's
final sketch is *identical* to the batch sketch over the concatenated
input (pinned by the batch⇄stream equivalence test).

Design:

* **Hashing stays JVM-side**: tokens explode and hash with the shared
  md5-based ``h32`` in codegen before the stateful operator — the
  Python state function only ever sees (lang, h) longs, never text.
* **Keyed state on the slice key** (``lang``): the K smallest distinct
  hashes.  Each incoming Arrow chunk is reduced with numpy
  (unique + partial min-K) so memory per chunk is O(K + chunk), and
  the hot-key case — one language dominating every batch — costs the
  chunk scan, not a buffer of the batch.  At cluster scale the one
  refinement is a per-partition min-K pre-combine (mapPartitions)
  before the group shuffle so a hot key receives at most
  K × partitions rows per batch; the sketch value is unchanged —
  that's what mergeability means.
* **Update-mode emission**: every batch emits each touched key's
  refreshed (n_sketch, kth_hash, est_distinct) row, so a dashboard
  reads the latest batch_id per key; the estimator is the same
  integer-exact ``(K-1)·2^32 // kth`` as the batch op.
* **Idempotent sink + replay-forced state execution** — the
  streaming/job.py per-batch_id overwrite pattern; on replay of an
  already-committed batch the plan still executes against a noop sink
  so the state store commits (same rationale as streaming/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_parser_spark.ops.common import h32, tokens
from pdf_parser_spark.ops.sketches import HASH_SPACE, KMV_K
from pdf_parser_spark.streaming.job import PAGES_STREAM_SCHEMA, _committed

CARD_STATE_SCHEMA = StructType(
    [StructField("mins", ArrayType(LongType()))]
)

CARD_OUTPUT_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_sketch", LongType()),
        StructField("kth_hash", LongType()),
        StructField("est_distinct", LongType()),
    ]
)


def _estimate(mins: np.ndarray) -> int:
    if len(mins) < KMV_K:
        return int(len(mins))
    return (KMV_K - 1) * HASH_SPACE // int(mins[-1])


def _card_group(key, pdf_iter, state: GroupState):
    """Merge one key's batch hashes into its min-K state and emit the
    refreshed sketch row."""
    (lang,) = key
    mins = np.array(state.get[0] if state.exists else [], dtype=np.int64)
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        chunk = pdf["h"].to_numpy(dtype=np.int64)
        merged = np.unique(np.concatenate([mins, chunk]))  # sorted
        mins = merged[:KMV_K]
    state.update((mins.tolist(),))
    yield pd.DataFrame(
        {
            "lang": [lang],
            "n_sketch": [len(mins)],
            "kth_hash": [int(mins[-1]) if len(mins) else 0],
            "est_distinct": [_estimate(mins)],
        }
    )


def stream_cardinality(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: StructType = PAGES_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """Drain all unprocessed page files through the per-lang KMV
    monitor; per-batch sketch rows land under
    ``{output_path}/sketches/batch_id=N``.  Blocks until drained."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    hashed = pages.select(
        "lang", F.explode(tokens(F.col("text"))).alias("t")
    ).select("lang", h32(F.col("t")).alias("h"))

    sketches = hashed.groupBy("lang").applyInPandasWithState(
        _card_group,
        outputStructType=CARD_OUTPUT_SCHEMA,
        stateStructType=CARD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = f"{output_path}/sketches/batch_id={batch_id}"
        if _committed(batch_df.sparkSession, out_dir):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        batch_df.write.mode("overwrite").parquet(out_dir)

    query = (
        sketches.writeStream.foreachBatch(process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def latest_sketches(spark: SparkSession, output_path: str) -> DataFrame:
    """Each key's most recent sketch across all drained batches."""
    rows = spark.read.parquet(f"{output_path}/sketches")
    w_max = rows.groupBy("lang").agg(F.max("batch_id").alias("batch_id"))
    return rows.join(w_max, ["lang", "batch_id"]).drop("batch_id")
