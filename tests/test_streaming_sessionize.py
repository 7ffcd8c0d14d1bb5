"""Stateful streaming sessionization: batch⇄streaming equivalence on
the sf events table, incremental two-batch state carry-over, and
idempotent-replay safety."""

import glob
import os
import shutil

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.ops.temporal import sessionize_events  # noqa: E402
from pdf_parser_spark.streaming.sessionize import (  # noqa: E402
    final_sessions,
    stream_sessionize,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("sessionize-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _batch_truth(spark):
    """The batch op's sessions keyed for comparison (session identity =
    (user_id, start_us); session_idx is a per-user ordinal)."""
    rows = sessionize_events(spark, SF_DIR).collect()
    return {
        (r.user_id, r.start_us): (r.n_events, r.value_cents, r.end_us, r.n_types)
        for r in rows
    }


def _streamed(spark, out):
    rows = final_sessions(spark, out).collect()
    return {
        (r.user_id, r.start_us): (r.n_events, r.value_cents, r.end_us, r.n_types)
        for r in rows
    }


def test_single_batch_matches_batch_op(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sess1"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)
    for f in glob.glob(f"{SF_DIR}/events.parquet/*.parquet") or [
        f"{SF_DIR}/events.parquet"
    ]:
        shutil.copy(f, inp)

    stream_sessionize(spark, inp, out, cp)
    assert _streamed(spark, out) == _batch_truth(spark)


def test_two_batches_carry_state(spark, tmp_path_factory):
    """Split the events by time into two landing files; with
    maxFilesPerTrigger=1 the second micro-batch must extend/close
    sessions left open by the first via the state store."""
    base = str(tmp_path_factory.mktemp("sess2"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)

    from pdf_parser_spark.ops.temporal import ntz_us

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "us", ntz_us("ts")
    )
    cut = ev.selectExpr("percentile(us, 0.5) p").collect()[0].p
    early = ev.filter(F.col("us") <= cut).drop("us")
    late = ev.filter(F.col("us") > cut).drop("us")
    assert early.count() and late.count()
    early.coalesce(1).write.parquet(f"{inp}/f0")
    late.coalesce(1).write.parquet(f"{inp}/f1")
    # file source orders batches by modification time: make it explicit
    t = 1_700_000_000
    for i, d in enumerate(("f0", "f1")):
        for p in glob.glob(f"{inp}/{d}/*.parquet"):
            os.utime(p, (t + i, t + i))

    stream_sessionize(
        spark, f"{inp}/*/", out, cp, max_files_per_trigger=1
    )
    batches = glob.glob(f"{out}/sessions/batch_id=*")
    assert len(batches) == 2, batches
    assert _streamed(spark, out) == _batch_truth(spark)


def test_replay_is_idempotent(spark, tmp_path_factory):
    """A re-run over an already-committed batch partition must not
    change the resolved sessions (the _SUCCESS check skips the write)."""
    base = str(tmp_path_factory.mktemp("sess3"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)
    for f in glob.glob(f"{SF_DIR}/events.parquet/*.parquet") or [
        f"{SF_DIR}/events.parquet"
    ]:
        shutil.copy(f, inp)

    stream_sessionize(spark, inp, out, cp)
    before = _streamed(spark, out)
    # simulate a foreachBatch replay of batch 0 against committed output
    from pdf_parser_spark.streaming.sessionize import _committed

    assert _committed(spark, f"{out}/sessions/batch_id=0")
    # drain again with the same checkpoint: no new files -> no new batch
    stream_sessionize(spark, inp, out, cp)
    assert _streamed(spark, out) == before


def test_group_fold_cents_floor_on_negative_values():
    """floor(v*100+0.5) must match the batch twin on NEGATIVE values
    (refunds): truncation-toward-zero once mapped -0.02 to -1 cent."""
    import pandas as pd

    from pdf_parser_spark.streaming.sessionize import _sessionize_group

    class _FakeState:
        exists = False

        def update(self, v):
            self.value = v

    batch = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2025-01-01 00:00:00", "2025-01-01 00:00:01"]),
            "event_type": ["refund", "refund"],
            "value": [-0.02, float("nan")],
        }
    )
    out = list(_sessionize_group((7,), iter([batch]), _FakeState()))[0]
    # floor(-2+0.5) = -2 for the refund; NaN contributes 0
    assert out.iloc[0]["value_cents"] == -2
