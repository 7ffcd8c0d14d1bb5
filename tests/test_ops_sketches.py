"""KMV cardinality-sketch edge behavior: the estimate must be EXACT
below the sketch size, a reasonable estimate above it (KMV's relative
error is ~1/sqrt(K-1) ≈ 13% at K=64; we assert a loose 35% band so the
test never flakes on hash luck), and engine-identical (DuckDB parity
on the in-test corpus)."""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.sketches import (  # noqa: E402
    CARDINALITY_KMV_SQL,
    KMV_K,
    cardinality_kmv,
)
from scripts.parity_check import norm_rows  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "sketch-edge-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def test_kmv_exact_small_estimate_large(spark, tmp_path):
    # source "small": 10 distinct tokens spread over 5 docs (< K ->
    # exact); source "big": 2000 distinct tokens over 40 docs (> K ->
    # estimated within the error band)
    rows = []
    for i in range(5):
        toks = " ".join(f"s{j}" for j in range(i * 2, i * 2 + 2))
        rows.append((i, toks, "en", "small", len(toks)))
    for i in range(40):
        toks = " ".join(f"b{j}" for j in range(i * 50, (i + 1) * 50))
        rows.append((100 + i, toks, "en", "big", len(toks)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    sdf = cardinality_kmv(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ddf = con.sql(CARDINALITY_KMV_SQL)
    assert sorted(cols) == sorted(ddf.columns)
    assert norm_rows(cols, srows) == norm_rows(ddf.columns, ddf.fetchall())

    ix = {c: k for k, c in enumerate(cols)}
    by_src = {r[ix["source"]]: r for r in srows}
    assert by_src["small"][ix["n_sketch"]] == 10
    assert by_src["small"][ix["est_distinct"]] == 10  # exact below K
    big = by_src["big"]
    assert big[ix["n_sketch"]] == KMV_K
    assert 0.65 * 2000 <= big[ix["est_distinct"]] <= 1.35 * 2000
