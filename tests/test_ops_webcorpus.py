"""Edge regressions for webcorpus ops: a document whose text
tokenizes to zero tokens must yield an empty result on BOTH engines —
Spark's F.sequence(1, 0, step) RAISES where DuckDB's generate_series
returns empty, so the guard in intradoc_dedup is load-bearing."""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.webcorpus import (  # noqa: E402
    INTRADOC_DEDUP_SQL,
    intradoc_dedup,
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "webcorpus-edge-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def test_intradoc_dedup_survives_empty_and_whitespace_text(spark, tmp_path):
    rows = [
        (1, "", "en", "src0", 0),
        (2, "   ", "en", "src0", 3),
        (3, "one two three four five six", "en", "src0", 27),
        (4, "rep rep rep rep rep rep", "en", "src0", 23),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["doc_id"]: r.asDict() for r in intradoc_dedup(spark, sf).collect()}
    # empty / whitespace docs drop out instead of raising
    assert set(out) == {3, 4}
    assert out[3]["rep_ratio_x100"] == 0
    # doc 4: paras = ["rep rep rep", "rep rep rep"] -> 50% repeated
    assert out[4]["n_para"] == 2 and out[4]["n_distinct"] == 1
    assert out[4]["rep_ratio_x100"] == 50

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ddf = con.execute(INTRADOC_DEDUP_SQL).df()
    assert set(ddf["doc_id"]) == {3, 4}
