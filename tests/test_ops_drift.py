"""token_drift: batch-over-corpus vocabulary drift telemetry."""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.drift import (  # noqa: E402
    MIN_TOTAL,
    PPM,
    TOKEN_DRIFT_SQL,
    token_drift,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("drift-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_rates_are_exact_integer_ppm(spark):
    rows = token_drift(spark, SF_DIR).collect()
    assert rows, "synthetic corpus has a vocabulary"
    total_new = sum(r["cnt_new"] for r in rows)
    total_old = sum(r["cnt_old"] for r in rows)
    # the sf corpus vocabulary is 31 tokens, all >= MIN_TOTAL, so the
    # result IS the whole counts table and totals are recoverable
    for r in rows:
        assert r["cnt_new"] + r["cnt_old"] >= MIN_TOTAL
        assert r["rpm_new"] == r["cnt_new"] * PPM // total_new
        assert r["rpm_old"] == r["cnt_old"] * PPM // total_old
        assert r["drift_ppm"] == r["rpm_new"] - r["rpm_old"]


def test_spam_flood_surfaces_first(spark, tmp_path):
    # batch doc (id 0) floods 'zzspam'; corpus docs (ids 1..4) never
    # contain it — the flood must rank first by |drift|
    base = "alpha beta gamma delta epsilon zeta eta theta"
    flood = " ".join(["zzspam"] * 40) + " " + base
    rows = [(0, flood)] + [(i, base) for i in range(1, 5)]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    got = token_drift(spark, str(tmp_path)).collect()
    assert got[0]["tok"] == "zzspam"
    assert got[0]["cnt_old"] == 0 and got[0]["cnt_new"] == 40
    assert got[0]["drift_ppm"] > 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    oracle = con.execute(TOKEN_DRIFT_SQL).fetchall()
    assert [
        (r["tok"], r["cnt_new"], r["cnt_old"], r["rpm_new"], r["rpm_old"],
         r["drift_ppm"])
        for r in got
    ] == [tuple(r) for r in oracle]
