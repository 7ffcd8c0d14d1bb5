"""dedup_cluster fixpoint probe thinning (ops/dedup.py).

The empty-diff convergence check is itself a Spark job; it must run on
at most every second round (and never before a pointer jump could have
converged), while the clustering output stays exactly the transitive
closure the recursive-CTE oracle computes — test_ops_parity.py pins
the values, this file pins the job economics.
"""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import dedup  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("cc-probe-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_probe_thinning_halves_fixpoint_jobs(spark):
    stats: dict = {}
    out = dedup.dedup_cluster(spark, SF_DIR, _stats=stats)
    rows = {(r.doc_id, r.component_id, r.csize) for r in out.collect()}

    # at most one probe per two rounds, and none before round 2
    assert stats["probes"] <= (stats["rounds"] + 1) // 2
    assert stats["probes"] >= 1  # the loop exited via a probe, not the cap
    assert stats["rounds"] < 20

    # output unchanged vs the recursive-CTE transitive-closure oracle
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = {tuple(r) for r in con.sql(dedup.DEDUP_CLUSTER_SQL).fetchall()}
    assert rows == oracle
