"""filter_overlap_matrix ablation telemetry (ops/ablation.py).

Pins: (a) the per-filter rejection counts equal independently-run
standalone filter ops (never-scored docs counting as rejected);
(b) matrix algebra invariants (diagonal, symmetric bounds,
inclusion-exclusion); (c) exact agreement with the composed DuckDB
oracle; (d) the plan has no cartesian and no text column crossing a
hash exchange.
"""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import ablation  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "ablation-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def matrix(spark):
    return {
        (r.filter_a, r.filter_b): r
        for r in ablation.filter_overlap_matrix(spark, SF_DIR).collect()
    }


def test_diagonal_and_bounds(matrix):
    names = ablation.FILTERS
    assert len(matrix) == 10
    for i, a in enumerate(names):
        d = matrix[(a, a)]
        assert d.rej_both == d.rej_a == d.rej_b == d.rej_union
        for b in names[i + 1:]:
            c = matrix[(a, b)]
            assert c.rej_both <= min(c.rej_a, c.rej_b)
            assert c.rej_union >= max(c.rej_a, c.rej_b)
            assert c.rej_union == c.rej_a + c.rej_b - c.rej_both
            assert c.rej_a == matrix[(a, a)].rej_a
            assert c.rej_b == matrix[(b, b)].rej_a


def test_per_filter_counts_match_standalone_ops(spark, matrix):
    from pdf_parser_spark.ops.filtering import quality_classifier
    from pdf_parser_spark.ops.heuristics import (
        c4_line_filter,
        ccnet_lm_filter,
        gopher_quality_filter,
    )

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    standalone = {
        "c4": (c4_line_filter, "doc_kept"),
        "ccnet": (ccnet_lm_filter, "kept"),
        "gopher": (gopher_quality_filter, "passes"),
        "quality": (quality_classifier, "kept"),
    }
    for name, (fn, col) in standalone.items():
        kept = fn(spark, SF_DIR).filter(f"{col}").count()
        # rejected = corpus size minus kept: docs the filter never
        # scores (zero tokens) count as rejected
        assert matrix[(name, name)].rej_a == n_docs - kept, name


def test_oracle_agreement(matrix):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.sql(ablation.FILTER_OVERLAP_MATRIX_SQL).fetchall()
    }
    got = {
        k: (v.rej_a, v.rej_b, v.rej_both, v.rej_union)
        for k, v in matrix.items()
    }
    assert got == oracle


def test_plan_no_cartesian_no_text_shuffle(spark):
    plan = (
        ablation.filter_overlap_matrix(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # ccnet's percentile cut crosses its 1-row totals aggregate with
    # the tiny distinct-score domain — the one sanctioned
    # BroadcastNestedLoopJoin, same as in the standalone op's plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # the verdict joins and the final reduce shuffle only ids/verdicts/
    # counters — the text column never crosses a hash exchange
    assert all(
        "text" not in seg[:300]
        for seg in plan.split("Exchange hashpartitioning")[1:]
    )
