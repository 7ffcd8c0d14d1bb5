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


# ---------------------------------------------------------------------------
# url_canonicalize: each rule class pinned on both engines
# ---------------------------------------------------------------------------

_CANON_CASES = [
    # (raw, canonical)
    ("https://WWW.Example.COM:443/p/0?x=1&utm_source=rss&y=2#frag",
     "https://www.example.com/p/0?x=1&y=2"),
    ("HTTP://user:pw@Example.com:80/p/1/", "http://example.com/p/1/"),
    ("https://ex2.Example.com.", "https://ex2.example.com/"),
    ("https://example.com:8080/p/3?utm_a=1&fbclid=zz",
     "https://example.com:8080/p/3"),
    ("http://sub.example.com/p/4?a=2&&b=3",
     "http://sub.example.com/p/4?a=2&b=3"),
    ("not a url 5", "not a url 5"),
    # extra rule probes beyond the derived-corpus classes
    ("ftp://Host.Example/readme", "ftp://host.example/readme"),
    ("https://h.example/?utm_campaign=x", "https://h.example/"),
    ("https://h.example:443", "https://h.example/"),
    ("http://h.example:8080/", "http://h.example:8080/"),
]


def test_url_canonicalize_rule_classes_spark(spark):
    from pyspark.sql import functions as F

    from pdf_parser_spark.ops.webcorpus import _url_canon_expr

    df = spark.createDataFrame(
        [(raw,) for raw, _ in _CANON_CASES], "raw string"
    ).select("raw", _url_canon_expr(F.col("raw")).alias("canon"))
    got = {r.raw: r.canon for r in df.collect()}
    for raw, want in _CANON_CASES:
        assert got[raw] == want, (raw, got[raw], want)


def test_url_canonicalize_rule_classes_duckdb():
    from pdf_parser_spark.ops.webcorpus import _url_canon_sql

    con = duckdb.connect()
    for raw, want in _CANON_CASES:
        lit = raw.replace("'", "''")
        got = con.sql(f"SELECT {_url_canon_sql(repr(lit))}").fetchone()[0]
        assert got == want, (raw, got, want)
