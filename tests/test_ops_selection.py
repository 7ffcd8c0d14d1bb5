"""Edge behavior for the round-3 selection/verification operators:

* dedup_edit_verify — every true (doc, perturbed-twin) LSH pair must
  verify, and the tail-window edit distance must respect the
  window-shift bound (<= 2 x length delta) the docstring promises;
* dsir_select — a token that only the target slice over-uses must
  raise the importance of the one non-target document carrying it
  above its peers, and the selected flag must equal the documented
  threshold inequality;
* crawl_priority — per-host doc counts must partition the corpus and
  the priority column must equal its defining formula exactly.

All three also run the driver-style DuckDB parity compare on the tiny
in-test corpus (independent of the sf0.001 sweep in test_ops_parity).
"""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.editverify import (  # noqa: E402
    DEDUP_EDIT_VERIFY_SQL,
    EDIT_MAX,
    dedup_edit_verify,
)
from pdf_parser_spark.ops.linkgraph import (  # noqa: E402
    CRAWL_PRIORITY_SQL,
    crawl_priority,
    linkgraph_pagerank,
)
from pdf_parser_spark.ops.selection import (  # noqa: E402
    DSIR_SELECT_SQL,
    SEL_DEN,
    SEL_NUM,
    TARGET_MOD,
    W_SCALE,
    dsir_select,
)
from scripts.parity_check import norm_rows  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "selection-edge-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def _duck(sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    return con


def _assert_parity(sdf, con, sql):
    srows = [tuple(r) for r in sdf.collect()]
    ddf = con.sql(sql)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert norm_rows(sdf.columns, srows) == norm_rows(
        ddf.columns, ddf.fetchall()
    )
    return srows, sdf.columns


def test_edit_verify_twins_and_window_bound(spark, tmp_path):
    # ten 12-token docs -> dedup_corpus plants a last-token-dropped
    # twin for each; LSH must surface the (doc, twin) pairs and the
    # verifier must pass every one of them
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(12))) for i in range(10)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    sdf = dedup_edit_verify(spark, sf)
    srows, cols = _assert_parity(sdf, _duck(sf), DEDUP_EDIT_VERIFY_SQL)
    ix = {c: k for k, c in enumerate(cols)}
    twins = [r for r in srows if r[ix["doc_b"]] == r[ix["doc_a"]] + 1000000]
    assert len(twins) == 10
    for r in twins:
        assert r[ix["verified"]] is True
        assert r[ix["tail_edit"]] <= 2 * r[ix["len_delta"]]
        assert r[ix["tail_edit"]] <= EDIT_MAX


def test_dsir_importance_separates_target_like_docs(spark, tmp_path):
    # doc_ids 0, 13, 26 are the target slice (TARGET_MOD == 13); they
    # over-use the token "rare".  Non-target doc 7 also carries it;
    # non-target docs 1..6 use only common tokens.
    assert TARGET_MOD == 13
    rows = [(i, "rare rare rare rare") for i in (0, 13, 26)]
    rows += [(i, "common words only here") for i in (1, 2, 3, 4, 5, 6)]
    rows += [(7, "rare rare rare common")]
    sf = _write_docs(spark, tmp_path, rows)
    sdf = dsir_select(spark, sf)
    srows, cols = _assert_parity(sdf, _duck(sf), DSIR_SELECT_SQL)
    ix = {c: k for k, c in enumerate(cols)}
    by_id = {r[ix["doc_id"]]: r for r in srows}
    assert set(by_id) == {1, 2, 3, 4, 5, 6, 7}  # target slice excluded
    imp = {i: by_id[i][ix["importance"]] for i in by_id}
    assert imp[7] > max(imp[i] for i in range(1, 7))
    for i, r in by_id.items():
        assert r[ix["selected"]] == (
            imp[i] * SEL_DEN >= SEL_NUM * W_SCALE
        )
    assert by_id[7][ix["selected"]] is True


def test_crawl_priority_partitions_docs_and_formula(spark, tmp_path):
    rows = [(i, f"text of document {i}") for i in range(40)]
    sf = _write_docs(spark, tmp_path, rows)
    sdf = crawl_priority(spark, sf)
    srows, cols = _assert_parity(sdf, _duck(sf), CRAWL_PRIORITY_SQL)
    ix = {c: k for k, c in enumerate(cols)}
    assert sum(r[ix["n_docs"]] for r in srows) == 40
    ranks = {
        r["host_id"]: r["pagerank_e9"]
        for r in linkgraph_pagerank(spark, sf).collect()
    }
    for r in srows:
        assert r[ix["priority_e9"]] == (
            r[ix["pagerank_e9"]] * 1000
        ) // (1 + r[ix["n_docs"]])
        assert r[ix["pagerank_e9"]] == ranks[r[ix["host_id"]]]
