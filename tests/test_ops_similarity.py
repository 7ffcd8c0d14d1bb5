"""ANN recall calibration (ops/similarity.py).

Two regimes:

* the driver's near-isotropic embeddings fixture — no sublinear-probe
  scheme can reach high absolute recall there (true top-3 cosines sit
  at ~0.3–0.45), so the bar is (a) multi-probe strictly beats
  single-probe and (b) measured recall agrees with the analytic
  sign-LSH expectation, which certifies the probe expansion is
  faithful rather than lucky;
* a clustered fixture (neighbors at cosine ≈ 0.95, the real-corpus
  regime the docstring claims) — there the absolute bar applies:
  Hamming≤1 multi-probe must recover ≥ 0.8 of brute-force truth.
"""

import math
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import similarity as sim  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("ann-recall-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _truth_pairs(con) -> list[tuple[int, int, float]]:
    """Brute-force (query_id, neighbor_id, cosine) top-k ground truth
    for the LSH query range, straight from DuckDB."""
    q = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM vecs
      WHERE vec_id >= {sim.LSH_QUERY_LO} AND vec_id < {sim.LSH_QUERY_HI}),
scored AS (
  SELECT q.qid, a.vec_id,
    list_reduce([(q.qv)[i] * (a.v)[i] FOR i IN generate_series(1, {sim.EMB_DIM})], (x,y)->x+y) /
    (sqrt(list_reduce([(q.qv)[i]^2 FOR i IN generate_series(1, {sim.EMB_DIM})], (x,y)->x+y)) *
     sqrt(list_reduce([(a.v)[i]^2 FOR i IN generate_series(1, {sim.EMB_DIM})], (x,y)->x+y))) AS cos
  FROM vecs a, q WHERE a.vec_id <> q.qid
),
ranked AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn
           FROM scored)
SELECT qid, vec_id, cos FROM ranked WHERE rn <= {sim.LSH_K}
"""
    return con.sql(q).fetchall()


def _expected_recall(truth, max_hamming: int) -> float:
    """Analytic sign-LSH survival probability averaged over the truth
    pairs: bit-agreement p = 1 - arccos(cos)/pi, independent bits."""
    n = sim.LSH_N_BITS
    total = 0.0
    for _, _, c in truth:
        p = 1 - math.acos(max(-1.0, min(1.0, c))) / math.pi
        total += sum(
            math.comb(n, d) * p ** (n - d) * (1 - p) ** d
            for d in range(max_hamming + 1)
        )
    return total / len(truth)


def test_multiprobe_beats_single_probe_and_matches_theory(spark):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    truth = _truth_pairs(con)
    tp = {(q, n) for q, n, _ in truth}

    got = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_lsh_topk(spark, SF_DIR).collect()
    }
    single_sql = sim.ANN_LSH_TOPK_SQL.replace(
        "unnest([bucket] || [xor(bucket, 1 << b) "
        f"FOR b IN generate_series(0, {sim.LSH_N_BITS - 1})])",
        "bucket",
    )
    single = {(r[0], r[1]) for r in con.sql(single_sql).fetchall()}

    recall_multi = len(tp & got) / len(tp)
    recall_single = len(tp & single) / len(tp)
    assert recall_multi > recall_single
    # faithful multi-probe: measured recall tracks the analytic
    # candidate-survival expectation (24 pairs => generous tolerance)
    assert abs(recall_multi - _expected_recall(truth, 1)) < 0.2
    assert abs(recall_single - _expected_recall(truth, 0)) < 0.15


def _write_clustered_embeddings(path: str) -> None:
    """Deterministic clustered corpus: 16 well-separated unit
    centroids, 16 members each.  Noise scale 0.02 over 64 dims puts
    member-member cosine at ~0.97 (the isotropic noise norm is
    0.02*sqrt(64) = 0.16 against a unit centroid).  Queries
    {LSH_QUERY_LO..HI} land in 8 distinct clusters."""
    rng = np.random.default_rng(20260819)
    centroids = rng.standard_normal((16, sim.EMB_DIM))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    vecs = []
    for i in range(256):
        c = centroids[i % 16]
        v = c + 0.02 * rng.standard_normal(sim.EMB_DIM)
        vecs.append(v / np.linalg.norm(v))
    arr = np.asarray(vecs, dtype=np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(256), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(arr.reshape(-1), pa.float32()), sim.EMB_DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array([i % 16 for i in range(256)], pa.int32()),
        }
    )
    pq.write_table(table, path)


def test_multiprobe_high_recall_on_clustered_corpus(spark, tmp_path):
    """The production-regime claim: with neighbors at cosine ~0.95,
    Hamming<=1 multi-probe recovers >=0.8 of brute-force truth while
    scanning ~7/64ths of the corpus per query."""
    sf = str(tmp_path)
    _write_clustered_embeddings(os.path.join(sf, "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    truth = _truth_pairs(con)
    tp = {(q, n) for q, n, _ in truth}
    assert min(c for _, _, c in truth) > 0.85  # the fixture is clustered

    got = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_lsh_topk(spark, sf).collect()
    }
    recall = len(tp & got) / len(tp)
    assert recall >= 0.8, recall
