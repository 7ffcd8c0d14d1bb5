"""Stateful streaming sessionization (`applyInPandasWithState`).

The batch twin is :func:`pdf_parser_spark.ops.temporal.sessionize_events`
(gap-based sessions over the events table); this module computes the
same sessions *incrementally* as event files land, holding ONE open
session per user in the state store instead of re-scanning history —
the custom-stateful-operator pattern Structured Streaming reserves for
semantics its built-in windowed aggregations can't express (session
windows keyed by inactivity gaps with arbitrary rollup state).

Design:

* **File source + ``availableNow``** — same drain-and-stop contract as
  :mod:`pdf_parser_spark.streaming.job`; the checkpoint's file log is
  the resume state.
* **State = the open session only** (start, last-event, rollups, type
  set), O(1) per user, never the event history.  A batch's events are
  sorted in-UDF; cross-batch order relies on time-partitioned landing
  files (crawl/event logs arrive in time order — the same assumption
  every streaming sessionizer makes; a late event would start a new
  session rather than corrupt state).
* **Update-mode emission**: sessions CLOSED by a batch are emitted as
  final (``closed=true``); the still-open session is emitted as a
  provisional snapshot (``closed=false``) and re-emitted (superseded)
  by later batches.  The reader keeps, per ``(user_id, start_us)``,
  the row from the highest batch — :func:`final_sessions` does exactly
  that.
* **Idempotent sink**: each micro-batch overwrites its own
  ``batch_id=N`` partition (the :mod:`streaming.job` pattern), so a
  replayed batch after a torn write cannot duplicate rows.

Arrow crosses only primitives (LONGs + one joined-string type set);
per-group work is a vectorized pandas fold, no per-row Python at the
Spark layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from pdf_parser_spark.ops.temporal import SESSION_GAP_US
from pdf_parser_spark.streaming.job import _committed

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
        StructField("types", StringType()),  # ','-joined sorted set
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
        StructField("n_types", LongType()),
        StructField("closed", BooleanType()),
    ]
)


def _sessionize_group(key, pdf_iter, state: GroupState):
    """Fold one user's batch slice into the open-session state."""
    (user_id,) = key
    frames = [pdf for pdf in pdf_iter]
    if not frames:
        return
    batch = pd.concat(frames, ignore_index=True).sort_values("ts")
    # naive-epoch micros: datetime64[ns] -> ns -> us (matches the batch
    # op's timestampdiff-from-NTZ-epoch and DuckDB's epoch_us)
    us = batch["ts"].astype("int64") // 1000
    # floor(v*100+0.5) like the batch twin — np.floor, NOT astype
    # truncation, which rounds toward zero and diverges on negative
    # values (-0.02: floor(-1.5) = -2 vs int(-1.5) = -1); NaN values
    # contribute 0, matching SUM's null-skipping on the batch side
    cents = np.floor(
        np.nan_to_num(batch["value"].to_numpy(dtype="float64")) * 100 + 0.5
    ).astype("int64")
    etype = batch["event_type"]

    if state.exists:
        start, last, n, total, types_s = state.get
        types = set(types_s.split(",")) if types_s else set()
    else:
        start = None
        types = set()

    out = []
    for t, c, ty in zip(us.tolist(), cents.tolist(), etype.tolist()):
        if start is not None and t - last > SESSION_GAP_US:
            out.append((user_id, start, last, n, total, len(types), True))
            start = None
        if start is None:
            start, last, n, total, types = t, t, 1, c, {ty}
        else:
            last, n, total = t, n + 1, total + c
            types.add(ty)
    state.update((start, last, n, total, ",".join(sorted(types))))
    out.append((user_id, start, last, n, total, len(types), False))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id",
            "start_us",
            "end_us",
            "n_events",
            "value_cents",
            "n_types",
            "closed",
        ],
    )


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: StructType = EVENTS_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """Drain all unprocessed event files through the stateful
    sessionizer; per-batch session rows land under
    ``{output_path}/sessions/batch_id=N``.  Blocks until drained."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_path)

    sessions = (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = f"{output_path}/sessions/batch_id={batch_id}"
        if _committed(batch_df.sparkSession, out_dir):
            # replayed committed batch: still execute the stateful plan
            # (noop sink) so the state store commits this batch's
            # session state — skipping execution could drop it forever
            batch_df.write.format("noop").mode("overwrite").save()
            return
        batch_df.write.mode("overwrite").parquet(out_dir)

    query = (
        sessions.writeStream.foreachBatch(process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def final_sessions(spark: SparkSession, output_path: str) -> DataFrame:
    """Resolve the update stream: per ``(user_id, start_us)`` keep the
    newest batch's row (a closed session supersedes its provisional
    snapshots).  ``max_by`` on the hive-partition ``batch_id`` — one
    skew-free aggregation."""
    from pyspark.sql import functions as F

    rows = spark.read.parquet(f"{output_path}/sessions")
    keep = [
        F.max_by(c, "batch_id").alias(c)
        for c in ("end_us", "n_events", "value_cents", "n_types", "closed")
    ]
    return rows.groupBy("user_id", "start_us").agg(*keep)
