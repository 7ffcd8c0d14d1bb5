"""Watermarked event-time windowed aggregation: emission up to the
final watermark (incl. the availableNow terminal flush batch), exact
equivalence with the batch twin on emitted windows, and late-data
dropping."""

import glob
import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.ops.temporal import ntz_us  # noqa: E402
from pdf_parser_spark.streaming.windows import (  # noqa: E402
    WATERMARK,
    batch_window_counts,
    stream_window_counts,
)

SF_DIR = "/root/testdata/sf0.001"
DAY_US = 24 * 3600 * 1_000_000
WATERMARK_US = 2 * DAY_US  # == WATERMARK ("2 days")


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("window-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _land_two_files(spark, inp, mutate_late=None):
    """Split sf events by median time into two landing files (older
    mtime first so the file source orders the batches)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "us", ntz_us("ts")
    )
    cut = ev.selectExpr("percentile(us, 0.5) p").collect()[0].p
    early = ev.filter(F.col("us") <= cut).drop("us")
    late = ev.filter(F.col("us") > cut).drop("us")
    if mutate_late is not None:
        late = mutate_late(late)
    early.coalesce(1).write.parquet(f"{inp}/f0")
    late.coalesce(1).write.parquet(f"{inp}/f1")
    t = 1_700_000_000
    for i, d in enumerate(("f0", "f1")):
        for p in glob.glob(f"{inp}/{d}/*.parquet"):
            os.utime(p, (t + i, t + i))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_emits_exactly_closed_windows(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("win1"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)
    _land_two_files(spark, inp)

    stream_window_counts(spark, f"{inp}/*/", out, cp, max_files_per_trigger=1)
    # availableNow runs a terminal no-data batch that advances emission
    # to the final watermark: 2 data batches + 1 flush batch
    assert len(os.listdir(f"{out}/windows")) == 3

    got = _rows(spark.read.parquet(f"{out}/windows").drop("batch_id"))
    batch = batch_window_counts(spark, f"{inp}/*/")
    max_us = (
        spark.read.parquet(f"{inp}/*/")
        .select(F.max(ntz_us("ts")))
        .collect()[0][0]
    )
    wm_us = max_us - WATERMARK_US
    closed = _rows(batch.filter(F.col("win_start_us") + DAY_US <= wm_us))
    still_open = _rows(batch.filter(F.col("win_start_us") + DAY_US > wm_us))
    assert got == closed
    assert still_open  # the tail exists and was (correctly) held back


def test_too_late_event_is_dropped(spark, tmp_path_factory):
    """A row older than the watermark arriving AFTER its window was
    evicted must be dropped (Spark's drop is best-effort: a late row
    whose window is still resident in the state store merges — so the
    late row here lands two batches after its window, past eviction)."""
    base = str(tmp_path_factory.mktemp("win2"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "us", ntz_us("ts")
    )
    c1 = ev.selectExpr("percentile(us, 0.34) p").collect()[0].p
    c2 = ev.selectExpr("percentile(us, 0.67) p").collect()[0].p
    min_ts = ev.agg(F.min("ts")).collect()[0][0]
    f0 = ev.filter(F.col("us") <= c1).drop("us")
    f1 = ev.filter((F.col("us") > c1) & (F.col("us") <= c2)).drop("us")
    f2 = ev.filter(F.col("us") > c2).drop("us")
    # retime one third-file event to the corpus minimum: its window
    # was evicted during batch 1, so batch 2 must drop it
    target = f2.agg(F.min("event_id")).collect()[0][0]
    f2 = f2.withColumn(
        "ts",
        F.when(F.col("event_id") == target, F.lit(min_ts)).otherwise(
            F.col("ts")
        ),
    )
    for i, (nm, df) in enumerate((("f0", f0), ("f1", f1), ("f2", f2))):
        df.coalesce(1).write.parquet(f"{inp}/{nm}")
        for p in glob.glob(f"{inp}/{nm}/*.parquet"):
            os.utime(p, (1_700_000_000 + i,) * 2)

    q = stream_window_counts(
        spark, f"{inp}/*/", out, cp, max_files_per_trigger=1
    )
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1

    got = spark.read.parquet(f"{out}/windows").drop("batch_id")
    first_win = got.agg(F.min("win_start_us")).collect()[0][0]
    got_first = _rows(got.filter(F.col("win_start_us") == first_win))
    # == batch over file 0 only: the late duplicate contributed nowhere
    batch_f0 = batch_window_counts(spark, f"{inp}/f0")
    exp_first = _rows(batch_f0.filter(F.col("win_start_us") == first_win))
    assert got_first == exp_first
    # ...whereas the batch twin over ALL files counts the late event
    batch_all = batch_window_counts(spark, f"{inp}/*/")
    all_first = _rows(batch_all.filter(F.col("win_start_us") == first_win))
    assert all_first != exp_first
