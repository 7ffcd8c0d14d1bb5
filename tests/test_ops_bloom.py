"""Bloom-filter membership contract: a Bloom filter may produce false
positives but NEVER false negatives — every true corpus member must
probe as maybe-present.  Also pins verdict classification and
engine-identity (DuckDB builds the exact same bit array)."""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.bloom import (  # noqa: E402
    BLOOM_INCREMENTAL_DEDUP_SQL,
    NEW_BATCH_MOD,
    bloom_incremental_dedup,
)
from scripts.parity_check import norm_rows  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "bloom-edge-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def test_bloom_no_false_negatives_and_parity(spark, tmp_path):
    # The filter indexes every document; each doc_id % NEW_BATCH_MOD == 0
    # document is probed twice: verbatim (a true member, MUST hit — the
    # no-false-negative half of the Bloom contract) and with its last
    # token dropped at doc_id + 1,000,000 (a non-member, may only hit as
    # an explicitly-classified false positive).
    rows = [
        (i, f"synthetic document number {i} body text", "en", "s", 10)
        for i in range(75)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    sdf = bloom_incremental_dedup(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns
    ix = {c: k for k, c in enumerate(cols)}

    n_probed = len(range(0, 75, NEW_BATCH_MOD))
    members = [r for r in srows if r[ix["doc_id"]] < 1000000]
    novels = [r for r in srows if r[ix["doc_id"]] >= 1000000]
    assert len(members) == len(novels) == n_probed
    for r in members:
        assert r[ix["true_member"]]
        # the Bloom contract: membership implies a positive probe
        assert r[ix["bloom_maybe"]], f"false negative at {r}"
        assert r[ix["verdict"]] == "dup"
    for r in novels:
        assert not r[ix["true_member"]]
        if r[ix["bloom_maybe"]]:
            assert r[ix["verdict"]] == "false_positive"
        else:
            assert r[ix["verdict"]] == "new"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ddf = con.sql(BLOOM_INCREMENTAL_DEDUP_SQL)
    assert sorted(cols) == sorted(ddf.columns)
    assert norm_rows(cols, srows) == norm_rows(ddf.columns, ddf.fetchall())
