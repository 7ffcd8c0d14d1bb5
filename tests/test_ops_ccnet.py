"""CCNet-style LM quality banding (ops/heuristics.py ccnet_lm_filter).

Value-exactness vs the DuckDB oracle is covered by test_ops_parity.py;
this file pins the semantic invariants: exact integer surprisal
arithmetic, percentile-cut band sizes, and the monotone relationship
between token rarity and surprisal.
"""

import os
import sys
from collections import Counter

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import heuristics as H  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("ccnet-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _exact_mbits(cnt: int) -> int:
    """Reference implementation of the integer millibit surprisal."""
    e = cnt.bit_length() - 1
    return (63 - e) * H.LM_SCALE - ((cnt - (1 << e)) * H.LM_SCALE) // (1 << e)


def test_integer_log2_interpolation_exact():
    # exact at powers of two, monotone non-increasing in between
    assert _exact_mbits(1) == 63_000
    assert _exact_mbits(2) == 62_000
    assert _exact_mbits(4) == 61_000
    prev = _exact_mbits(1)
    for cnt in range(2, 5000):
        cur = _exact_mbits(cnt)
        assert cur <= prev, cnt
        prev = cur


def test_bands_follow_percentile_cuts(spark):
    rows = H.ccnet_lm_filter(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    by_band = Counter(r.band for r in rows)
    assert set(by_band) == {"head", "middle", "tail"}
    # the head band holds at least LM_HEAD_PCT% (ties land low), and
    # head+middle at least LM_MIDDLE_PCT%
    assert by_band["head"] * 100 >= H.LM_HEAD_PCT * n
    assert (by_band["head"] + by_band["middle"]) * 100 >= H.LM_MIDDLE_PCT * n
    # bands are a monotone partition of the score axis
    hi_head = max(r.mean_mbits for r in rows if r.band == "head")
    lo_mid = min(r.mean_mbits for r in rows if r.band == "middle")
    hi_mid = max(r.mean_mbits for r in rows if r.band == "middle")
    lo_tail = min(r.mean_mbits for r in rows if r.band == "tail")
    assert hi_head < lo_mid and hi_mid < lo_tail
    for r in rows:
        assert r.kept == (r.band != "tail")
        assert r.mean_mbits == r.total_mbits // r.n_tokens


def test_plan_broadcasts_bucket_table(spark):
    plan = (
        H.ccnet_lm_filter(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # bucket counts back onto tokens
    assert "partial_count" in plan  # map-side combine before exchanges
