"""Streaming Count-Min monitor: the drained stream's final grid must
equal the batch grid over the concatenated input cell-for-cell (counts
are additive — the algebraic-merge property), estimates derived from it
must never undercount, and a second drain over the same files must be
a no-op (idempotent replay)."""

import datetime
import hashlib
import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pdf_parser_spark.ops.sketches import CMS_D, CMS_W  # noqa: E402
from pdf_parser_spark.streaming.heavyhitters import (  # noqa: E402
    estimate_counts,
    final_grid,
    stream_heavy_hitters,
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "stream-hh-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


_TS = datetime.datetime(2025, 1, 1)


def _write_pages(spark, path, rows):
    df = spark.createDataFrame(
        [(u, _TS, bytearray(b""), t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    df.coalesce(1).write.parquet(path)


def _h32(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def _expected_grid(texts):
    grid = {}
    for txt in texts:
        for tok in txt.split():
            if not tok:
                continue
            h = _h32(tok)
            for d in range(CMS_D):
                key = (d, (h >> (6 * d)) % CMS_W)
                grid[key] = grid.get(key, 0) + 1
    return grid


def test_stream_grid_equals_batch_over_union(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("hh1"))
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    texts_a = ["hot cold hot", "hot alpha beta"]
    texts_b = ["hot gamma", "delta delta hot"]
    _write_pages(spark, f"{inp}/a", [(f"u{i}", t) for i, t in enumerate(texts_a)])
    stream_heavy_hitters(spark, f"{inp}/*/", out, ckpt, max_files_per_trigger=1)
    _write_pages(spark, f"{inp}/b", [(f"v{i}", t) for i, t in enumerate(texts_b)])
    stream_heavy_hitters(spark, f"{inp}/*/", out, ckpt, max_files_per_trigger=1)

    got = {
        (r["d"], r["cell"]): r["cnt"]
        for r in final_grid(spark, out).collect()
    }
    assert got == _expected_grid(texts_a + texts_b)

    # estimates from the drained grid: never undercount, exact for
    # tokens with collision-free cells in at least one row
    est = {
        r["token"]: r["cms_est"]
        for r in estimate_counts(final_grid(spark, out), ["hot", "delta"]).collect()
    }
    assert est["hot"] >= 5
    assert est["delta"] >= 2

    # a probe token the stream never saw must come back as a row with
    # est 0 when its cells are untouched (absent grid cell == zero
    # counter), never be silently dropped from the result
    probe = "zq9never8seen7token"
    untouched = all(
        ((d, (_h32(probe) >> (6 * d)) % CMS_W) not in got) for d in range(CMS_D)
    )
    est2 = {
        r["token"]: r["cms_est"]
        for r in estimate_counts(
            final_grid(spark, out), ["hot", probe]
        ).collect()
    }
    assert probe in est2
    if untouched:
        assert est2[probe] == 0
    assert est2["hot"] >= 5


def test_stream_replay_is_idempotent(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("hh2"))
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    _write_pages(spark, f"{inp}/a", [("u0", "x y x")])
    stream_heavy_hitters(spark, f"{inp}/*/", out, ckpt)
    first = {
        (r["d"], r["cell"]): r["cnt"]
        for r in final_grid(spark, out).collect()
    }
    # re-drain with the same checkpoint: no new data, grid unchanged
    stream_heavy_hitters(spark, f"{inp}/*/", out, ckpt)
    second = {
        (r["d"], r["cell"]): r["cnt"]
        for r in final_grid(spark, out).collect()
    }
    assert first == second == _expected_grid(["x y x"])
