"""incremental_minhash_dedup: cross-batch near-dup admission.

Structure + twin-recovery over the driver testdata, plus both verdict
branches over a crafted corpus (the synthetic sf tables are long-doc
heavy, so every batch doc is blocked there — the admit=True branch
needs a short doc whose twin legitimately misses all LSH bands).
"""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.incnear import (  # noqa: E402
    INCREMENTAL_MINHASH_DEDUP_SQL,
    incremental_minhash_dedup,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "incnear-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def test_batch_coverage_and_twin_recovery(spark):
    rows = {
        r["doc_id"]: r
        for r in incremental_minhash_dedup(spark, SF_DIR).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
        "WHERE len(list_filter(string_split(text,' '), t -> t <> '')) >= 4 "
        "AND doc_id % 5 = 0"
    ).fetchall()
    expected = {d for (d,) in docs}
    # every eligible batch doc gets exactly one verdict row
    assert set(rows) == expected
    # the synthetic docs are long, so each batch doc's perturbed twin
    # (doc_id + 1e6, in the index by construction) must band-collide
    # and block admission with a high signature estimate
    for r in rows.values():
        assert r["n_candidates"] >= 1
        assert r["max_est_jaccard"] >= 0.8
        assert r["admit"] is False


def _crafted_corpus(spark, tmp_path):
    # doc 0 (batch): 5 tokens — its 4-token twin shares NO LSH band
    # and only 7/16 signature slots (verified constants, see the
    # search in the module history): the admit=True branch.
    # doc 5 (batch): long doc — twin blocks it.
    # doc 1 (index): unrelated long doc.
    short = " ".join(f"w9x{i}" for i in range(5))
    long_a = " ".join(f"alpha{i} beta{i}" for i in range(15))
    long_b = " ".join(f"gamma{i} delta{i}" for i in range(15))
    df = spark.createDataFrame(
        [
            (0, short, "en", "src0", len(short)),
            (5, long_a, "en", "src0", len(long_a)),
            (1, long_b, "en", "src1", len(long_b)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def test_both_verdict_branches_and_oracle(spark, tmp_path):
    sf_dir = _crafted_corpus(spark, tmp_path)
    got = {
        r["doc_id"]: r
        for r in incremental_minhash_dedup(spark, sf_dir).collect()
    }
    assert set(got) == {0, 5}
    assert got[0]["admit"] is True and got[0]["max_est_jaccard"] < 0.5
    assert got[5]["admit"] is False and got[5]["n_candidates"] >= 1
    # DuckDB twin agrees value-for-value on the crafted corpus too
    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        int(r[0]): r
        for r in con.execute(INCREMENTAL_MINHASH_DEDUP_SQL).fetchall()
    }
    for doc_id, r in got.items():
        o = oracle[doc_id]
        assert (r["n_candidates"], r["max_est_jaccard"], r["admit"]) == (
            o[1],
            o[2],
            o[3],
        )
