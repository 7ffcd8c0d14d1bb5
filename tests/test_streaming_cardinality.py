"""Streaming KMV cardinality monitor: cross-batch merge correctness
(the drained stream's final sketch must equal the batch KMV over the
concatenated input — the mergeability property), exactness below K,
and monotone sketch growth across batches."""

import datetime
import glob
import hashlib
import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pdf_parser_spark.ops.sketches import KMV_K  # noqa: E402
from pdf_parser_spark.streaming.cardinality import (  # noqa: E402
    latest_sketches,
    stream_cardinality,
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "stream-card-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


_TS = datetime.datetime(2025, 1, 1)


def _write_pages(spark, path, rows):
    """rows: [(url, text, lang)] in the pages stream schema."""
    df = spark.createDataFrame(
        [(u, _TS, bytearray(b""), t, lang) for u, t, lang in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    df.coalesce(1).write.parquet(path)


def _h32(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def _expected_sketch(texts):
    hs = sorted({_h32(t) for txt in texts for t in txt.split() if t})
    mins = hs[:KMV_K]
    if len(mins) < KMV_K:
        est = len(mins)
    else:
        est = (KMV_K - 1) * 2**32 // mins[-1]
    return len(mins), (mins[-1] if mins else 0), est


def test_stream_kmv_equals_batch_over_union(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sc1"))
    inp, out, cp = f"{base}/in", f"{base}/out", f"{base}/cp"
    # "en": 300 distinct tokens split across two batches with overlap
    # (> K -> estimated); "de": 9 distinct tokens (< K -> exact)
    b0_en = " ".join(f"tok{i}" for i in range(0, 180))
    b1_en = " ".join(f"tok{i}" for i in range(120, 300))  # 60 repeats
    de = "eins zwei drei vier fuenf sechs sieben acht neun"
    _write_pages(spark, f"{inp}/f0", [("u0", b0_en, "en"), ("u1", de, "de")])
    _write_pages(spark, f"{inp}/f1", [("u2", b1_en, "en")])
    t = 1_700_000_000
    for i, d in enumerate(("f0", "f1")):
        for p in glob.glob(f"{inp}/{d}/*.parquet"):
            os.utime(p, (t + i, t + i))

    stream_cardinality(spark, f"{inp}/*/", out, cp, max_files_per_trigger=1)
    batches = glob.glob(f"{out}/sketches/batch_id=*")
    assert len(batches) == 2, batches

    final = {
        r.lang: (r.n_sketch, r.kth_hash, r.est_distinct)
        for r in latest_sketches(spark, out).collect()
    }
    assert final["en"] == _expected_sketch([b0_en, b1_en])
    assert final["de"] == _expected_sketch([de])
    assert final["de"] == (9, _expected_sketch([de])[1], 9)  # exact < K
    # the estimate is in KMV's error band around the true 300
    assert 0.65 * 300 <= final["en"][2] <= 1.35 * 300

    # batch 0's en sketch must be a refinable prefix: kth_hash can only
    # DECREASE as more hashes arrive (min-K is monotone)
    rows = spark.read.parquet(f"{out}/sketches")
    en = {r.batch_id: r for r in rows.filter(rows.lang == "en").collect()}
    assert en[1].kth_hash <= en[0].kth_hash
    assert en[1].n_sketch >= en[0].n_sketch
