"""Recrawl operators (ops/recrawl.py): crawl_delta semantics and
anchor_text_stats aggregation invariants.  Value-exactness vs the
DuckDB oracles is covered by tests/test_ops_parity.py; this file pins
the semantic invariants and the plan shapes.
"""

import os
import sys
from collections import Counter

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import recrawl  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("recrawl-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_crawl_delta_statuses_and_keys(spark):
    rows = recrawl.crawl_delta(spark, SF_DIR).collect()
    # one verdict per url, every url in the universe covered
    assert len({r.url_key for r in rows}) == len(rows) == recrawl.URL_KEY_MOD
    by_status = Counter(r.status for r in rows)
    # all four arms exercised by the deterministic synthesis
    assert set(by_status) == {"added", "removed", "changed", "unchanged"}
    for r in rows:
        if r.status == "added":
            assert r.old_doc == -1 and r.new_doc >= 0
        elif r.status == "removed":
            assert r.new_doc == -1 and r.old_doc >= 0
        else:
            assert r.old_doc >= 0 and r.new_doc >= 0
            # representatives come from the right batches
            assert r.old_doc % 2 == 0 and r.new_doc % 2 == 1
        if r.status == "unchanged":
            assert r.url_key % recrawl.STABLE_MOD == 0  # the stable pages


def test_crawl_delta_plan_no_text_past_scan(spark):
    """text enters only the scan-side md5; nothing document-sized
    crosses the join — the plan shuffles (url_key, doc_id, sig) only."""
    plan = (
        recrawl.crawl_delta(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan  # full outer
    assert "ArrowEvalPython" not in plan
    # map-side partial aggregation runs BELOW the exchange, so only
    # one already-aggregated (url_key, rep, sig) row per url per batch
    # is shuffled — text is consumed by md5 in the scan-side project
    assert "partial_min" in plan
    import re

    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "url_key" in keys
        assert "text" not in keys


def test_anchor_text_stats_invariants(spark):
    rows = recrawl.anchor_text_stats(spark, SF_DIR).collect()
    assert 0 < len(rows) <= recrawl.N_HOSTS
    total_links = sum(r.n_links for r in rows)
    for r in rows:
        assert 1 <= r.n_src_hosts <= min(r.n_links, recrawl.N_HOSTS - 1)
        assert r.top_anchor in recrawl.ANCHOR_VOCAB
        assert 1 <= r.top_anchor_count <= r.n_links
    # self-loops dropped, everything else kept: at most K_OUT per doc
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total_links <= recrawl.K_OUT * n_docs


def test_anchor_text_stats_plan_host_grained(spark):
    plan = (
        recrawl.anchor_text_stats(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # map-side partial aggregation before every shuffle
    assert "partial_count" in plan
