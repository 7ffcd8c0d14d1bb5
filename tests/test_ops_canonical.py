"""dedup_canonical keep-one-per-cluster selection (ops/canonical.py).

Pins: (a) the output is a complete keep-set — every component from
dedup_cluster appears once, and every unpaired document appears as its
own singleton; (b) the canonical member really is the cluster's
arg-max of (quality, -doc_id) recomputed independently; (c) exact
agreement with the recursive-CTE + window DuckDB oracle; (d) the plan
aggregates partially below the exchange (struct-max, not a window) and
contains no cartesian join.
"""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import canonical, dedup  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "canonical-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def result(spark):
    return canonical.dedup_canonical(spark, SF_DIR).collect()


def _oracle_con():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_complete_keep_set_and_winner_policy(spark, result):
    comps = {
        r.doc_id: (r.component_id, r.csize)
        for r in dedup.dedup_cluster(spark, SF_DIR).collect()
    }
    con = _oracle_con()
    q = dict(
        con.sql(
            "SELECT doc_id, CAST(floor((0.4 * (len(list_filter(t, x -> x IN "
            "('the','a','of','and','in','to','is')))::DOUBLE / len(t)) + 0.3 "
            "* (len(list_distinct(t))::DOUBLE / len(t)) + 0.3 * "
            "least(len(t)::DOUBLE / 50.0, 1.0)) * 10000.0 + 0.5) AS BIGINT) "
            "FROM (SELECT doc_id, list_filter(string_split_regex(text, "
            "'\\s+'), x -> x <> '') AS t FROM documents)"
        ).fetchall()
    )
    # ground-truth winner per component, singletons included
    clusters: dict = {}
    for doc_id in q:
        comp, csize = comps.get(doc_id, (doc_id, 1))
        clusters.setdefault(comp, (csize, []))[1].append(doc_id)
    got = {r.component_id: r for r in result}
    assert set(got) == set(clusters)
    for comp, (csize, members) in clusters.items():
        want = max(members, key=lambda d: (q[d], -d))
        r = got[comp]
        assert (r.canonical_doc, r.canonical_q, r.csize, r.dropped) == (
            want, q[want], csize, csize - 1
        ), comp
    # every real doc lands in exactly one cluster (asserted above via
    # set equality); canonicals are distinct real docs.  csize counts
    # ALL cluster members, including the pair-generator's synthesized
    # near-dup twins (ids offset out of the documents table), so it is
    # >= the real-member count, never equal to the corpus size.
    canon = [r.canonical_doc for r in result]
    assert len(set(canon)) == len(canon)
    assert all(c in q for c in canon)
    for comp, (csize, members) in clusters.items():
        assert csize >= len(members), comp


def test_oracle_agreement(result):
    con = _oracle_con()
    oracle = {tuple(r) for r in con.sql(canonical.DEDUP_CANONICAL_SQL).fetchall()}
    got = {
        (r.component_id, r.csize, r.canonical_doc, r.canonical_q, r.dropped)
        for r in result
    }
    assert got == oracle


def test_plan_partial_agg_no_window_no_cartesian(spark):
    plan = (
        canonical.dedup_canonical(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # winner selection is an aggregate (map-side combinable), not a sort+window
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan
    # no row-at-a-time Python anywhere; the only Arrow UDF is the
    # upstream pair generator's shingle_hashes
    assert "BatchEvalPython" not in plan
    assert all(
        "shingle_hashes" in seg[:200]
        for seg in plan.split("ArrowEvalPython ")[1:]
    )
