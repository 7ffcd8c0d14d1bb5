"""Streaming cross-batch exact dedup: first-arrival admission within
and across micro-batches, per-row verdicts, and idempotent replay."""

import glob
import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.streaming.dedup import (  # noqa: E402
    admitted_pages,
    stream_dedup,
)

import datetime  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("stream-dedup-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


_TS = datetime.datetime(2025, 1, 1)


def _write_pages(spark, path, rows):
    """rows: [(url, payload_bytes)] -> one landing file in the pages
    stream schema."""
    df = spark.createDataFrame(
        [(u, _TS, bytearray(p), "", "en") for u, p in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    df.coalesce(1).write.parquet(path)


def _verdicts(spark, out):
    return {
        (r.url, r.batch_id): (r.admitted, r.keeper_url)
        for r in spark.read.parquet(f"{out}/verdicts").collect()
    }


def test_single_batch_min_url_keeper(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sd1"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    _write_pages(
        spark,
        f"{inp}/f0",
        [
            ("u3", b"payload-A"),
            ("u1", b"payload-A"),  # same content, smaller url -> keeper
            ("u2", b"payload-B"),
        ],
    )
    stream_dedup(spark, f"{inp}/*/", out, cp)
    v = _verdicts(spark, out)
    assert v[("u1", 0)] == (True, "u1")
    assert v[("u3", 0)] == (False, "u1")
    assert v[("u2", 0)] == (True, "u2")
    adm = {r.url for r in admitted_pages(spark, out).collect()}
    assert adm == {"u1", "u2"}


def test_cross_batch_rejection_via_state(spark, tmp_path_factory):
    """A hash admitted in batch 0 must be rejected in batch 1 with the
    original keeper, even though batch 1 never reads batch 0's data —
    only the state store carries it."""
    base = str(tmp_path_factory.mktemp("sd2"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    _write_pages(spark, f"{inp}/f0", [("a1", b"X"), ("a2", b"Y")])
    _write_pages(
        spark,
        f"{inp}/f1",
        [("b0", b"X"), ("b1", b"Z"), ("b2", b"Z")],
    )
    t = 1_700_000_000
    for i, d in enumerate(("f0", "f1")):
        for p in glob.glob(f"{inp}/{d}/*.parquet"):
            os.utime(p, (t + i, t + i))

    stream_dedup(spark, f"{inp}/*/", out, cp, max_files_per_trigger=1)
    batches = glob.glob(f"{out}/verdicts/batch_id=*")
    assert len(batches) == 2, batches
    v = _verdicts(spark, out)
    assert v[("a1", 0)] == (True, "a1")
    # cross-batch dup: rejected, keeper points at batch 0's row
    assert v[("b0", 1)] == (False, "a1")
    # new hash in batch 1 admits its min url
    assert v[("b1", 1)] == (True, "b1")
    assert v[("b2", 1)] == (False, "b1")
    adm = {r.url for r in admitted_pages(spark, out).collect()}
    assert adm == {"a1", "a2", "b1"}


def test_duplicate_url_rows_admit_exactly_once(spark, tmp_path_factory):
    """The same (url, payload) row appearing twice in one batch (a page
    crawled twice in one landing window) must admit exactly ONE row —
    the keeper's first occurrence — not every row matching the keeper
    url."""
    base = str(tmp_path_factory.mktemp("sd4"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    _write_pages(
        spark,
        f"{inp}/f0",
        [("u1", b"X"), ("u1", b"X"), ("u2", b"X")],
    )
    stream_dedup(spark, f"{inp}/*/", out, cp)
    rows = spark.read.parquet(f"{out}/verdicts").collect()
    assert len(rows) == 3
    admitted = [r for r in rows if r.admitted]
    assert len(admitted) == 1
    assert admitted[0].url == "u1"
    assert all(r.keeper_url == "u1" for r in rows)


def test_replay_is_idempotent(spark, tmp_path_factory):
    """Re-running a drained stream must add no batches and change no
    verdicts (checkpoint file-log + _SUCCESS-guarded sink)."""
    base = str(tmp_path_factory.mktemp("sd3"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    _write_pages(spark, f"{inp}/f0", [("u1", b"P"), ("u2", b"P")])
    stream_dedup(spark, f"{inp}/*/", out, cp)
    before = _verdicts(spark, out)
    stream_dedup(spark, f"{inp}/*/", out, cp)  # nothing new to drain
    assert _verdicts(spark, out) == before
    assert len(glob.glob(f"{out}/verdicts/batch_id=*")) == 1
