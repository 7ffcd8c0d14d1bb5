"""SemDeDup semantic dedup: twin pairs share a cluster and prune
exactly one member (the centroid-closer one), the pair join is
cluster-keyed (never all-pairs), and the op agrees with its oracle
(covered op-by-op in test_ops_parity; pinned structurally here)."""

import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pdf_parser_spark.ops.dedup import EMB_TWIN_LIMIT  # noqa: E402
from pdf_parser_spark.ops.semantic import dedup_semantic  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "semantic-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def result(spark):
    return {r.vec_id: r for r in dedup_semantic(spark, SF_DIR).collect()}


def test_cocluster_twins_prune_exactly_one(result):
    n_vecs = max(v for v in result if v < 1_000_000) + 1
    n_twins = min(EMB_TWIN_LIMIT, n_vecs)
    assert n_twins > 0
    pruned_total = sum(1 for r in result.values() if r.pruned)
    co_clustered = 0
    for vid in range(n_twins):
        orig, twin = result[vid], result[vid + 1_000_000]
        if orig.cluster_id != twin.cluster_id:
            # a boundary-straddling twin legitimately escapes SemDeDup
            # (pruning is intra-cluster by design); neither member may
            # be pruned through this pair
            continue
        co_clustered += 1
        assert orig.pruned != twin.pruned, vid  # exactly one survives
        loser = orig if orig.pruned else twin
        keeper = twin if orig.pruned else orig
        # SemDeDup keep-policy: prune the centroid-CLOSER member
        assert (loser.dist, -loser.vec_id) <= (keeper.dist, -keeper.vec_id)
    # the perturbation is tiny: the overwhelming majority of twins
    # must land with their original, and every prune on this corpus
    # is accounted for by a co-clustered twin pair
    assert co_clustered >= int(0.9 * n_twins)
    assert pruned_total == co_clustered


def test_pair_join_is_cluster_bucketed(spark):
    p = (
        dedup_semantic(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert any("cluster_id" in seg[:300] for seg in p.split("Join")[1:])
