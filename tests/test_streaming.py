"""Streaming-ingest extraction: incremental drain, checkpoint resume,
batch⇄streaming equivalence (one extraction code path)."""

import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from fixtures.gen import build_pdf_corpus  # noqa: E402
from pdf_parser_spark.engine import extract_document  # noqa: E402
from pdf_parser_spark.streaming import stream_extract  # noqa: E402
from pdf_parser_spark.streaming.job import PAGES_STREAM_SCHEMA  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("streaming-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


_EPOCH = __import__("datetime").datetime(2025, 1, 1)


def _rows(case_ids, corpus):
    return [
        (f"https://fixtures.test/{cid}", _EPOCH, bytearray(corpus[cid]), "", "en")
        for cid in case_ids
    ]


def test_stream_drains_then_resumes(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)

    corpus = build_pdf_corpus()
    ids = sorted(corpus)
    first, second = ids[:8], ids[8:14]

    spark.createDataFrame(_rows(first, corpus), PAGES_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, cp, threshold=100_000)

    got1 = spark.read.parquet(f"{out}/extracted")
    assert got1.count() == len(first)

    # second drop: a rerun with the SAME checkpoint processes ONLY the
    # new files (file-log resume), appending to the output
    spark.createDataFrame(_rows(second, corpus), PAGES_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, cp, threshold=100_000)

    got2 = spark.read.parquet(f"{out}/extracted")
    assert got2.count() == len(first) + len(second)
    assert got2.select("url").distinct().count() == len(first) + len(second)

    # byte-identity: streaming output == engine-direct, per url
    rows = {r["url"]: r for r in got2.collect()}
    for cid in first + second:
        expected = extract_document(corpus[cid])
        assert rows[f"https://fixtures.test/{cid}"]["text_extracted"] == expected["text"], cid

    # per-batch lineage rows landed with batch ids
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.select("batch_id").distinct().count() >= 2
    total = lin.agg(F.sum("row_count")).collect()[0][0]
    assert total == len(first) + len(second)


def test_stream_replay_is_idempotent(spark, tmp_path_factory):
    """Exactly-once: a micro-batch replayed after a crash between the
    sink write and the checkpoint commit must not duplicate rows."""
    import glob
    import shutil

    base = str(tmp_path_factory.mktemp("stream-replay"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    os.makedirs(inp)

    corpus = build_pdf_corpus()
    ids = sorted(corpus)[:6]
    spark.createDataFrame(_rows(ids, corpus), PAGES_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, cp, threshold=100_000)
    n0 = spark.read.parquet(f"{out}/extracted").count()
    assert n0 == len(ids)

    # simulate the crash window: the sink committed but the streaming
    # checkpoint did not.  (Spark 4's checkpoint manager caches commit
    # state per path in the JVM and flags in-place edits as a
    # concurrent query, so model the crashed driver by cloning the
    # checkpoint minus the commit marker to a fresh path — identical
    # recovery semantics: offsets say batch 0 planned, commits say it
    # never finished, so the SAME batch replays with the SAME rows.)
    def replay_checkpoint(src, dst):
        shutil.copytree(src, dst)
        commits = sorted(glob.glob(f"{dst}/commits/*"))
        assert commits
        os.remove(commits[-1])
        # drop the Hadoop checksum sibling too, else the local FS
        # treats the half-present commit as a concurrent writer
        crc = "{}/.{}.crc".format(
            os.path.dirname(commits[-1]), os.path.basename(commits[-1])
        )
        if os.path.exists(crc):
            os.remove(crc)

    replay_checkpoint(cp, f"{base}/cp2")
    stream_extract(spark, inp, out, f"{base}/cp2", threshold=100_000)
    assert spark.read.parquet(f"{out}/extracted").count() == n0
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.agg(F.sum("row_count")).collect()[0][0] == n0

    # torn write variant: output partially written (no _SUCCESS, a data
    # file lost), lineage never landed — the scoped overwrite heals it
    batch_dirs = glob.glob(f"{out}/extracted/batch_id=*")
    assert batch_dirs
    os.remove(f"{batch_dirs[0]}/_SUCCESS")
    for f_ in glob.glob(f"{batch_dirs[0]}/part-*")[:1]:
        os.remove(f_)
    shutil.rmtree(f"{out}/lineage")
    replay_checkpoint(cp, f"{base}/cp3")
    stream_extract(spark, inp, out, f"{base}/cp3", threshold=100_000)
    assert spark.read.parquet(f"{out}/extracted").count() == n0
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.agg(F.sum("row_count")).collect()[0][0] == n0
