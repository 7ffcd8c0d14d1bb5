"""text_entropy (ops/textstats.py): exact integer millibit entropy.

Oracle parity is covered by tests/test_ops_parity.py; this file pins
the formula against an independent pure-Python reference, the
boundary properties of the integer log, and the plan shape.
"""

import math
import os
import sys
from collections import Counter

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import textstats as T  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _L(x: int) -> int:
    e = x.bit_length() - 1
    return e * 1000 + (x - (1 << e)) * 1000 // (1 << e)


def _H_mbits(tokens: list[str]) -> int:
    c = Counter(tokens)
    n = len(tokens)
    return (n * _L(n) - sum(v * _L(v) for v in c.values())) // n


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("entropy-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_matches_pure_python_reference(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    rows = T.text_entropy(spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    for r in rows:
        toks = [t for t in docs[r.doc_id].split(" ") if t]
        assert r.n_tokens == len(toks)
        assert r.n_distinct == len(set(toks))
        assert r.entropy_mbits == _H_mbits(toks), r.doc_id


def test_integer_entropy_properties():
    # constant doc -> zero entropy; all-distinct -> L(n) (up to the
    # floor division); integer H tracks float H within interpolation
    # error on random-ish distributions
    assert _H_mbits(["a"] * 50) == 0
    n = 64
    assert _H_mbits([f"t{i}" for i in range(n)]) == _L(n)  # = 6000 exactly
    import random

    rng = random.Random(7)
    for _ in range(50):
        toks = [f"w{rng.randint(0, 30)}" for _ in range(rng.randint(2, 400))]
        c = Counter(toks)
        nn = len(toks)
        h_float = -sum((v / nn) * math.log2(v / nn) for v in c.values())
        h_int = _H_mbits(toks) / 1000
        assert abs(h_int - h_float) < 0.15, (h_int, h_float)


def test_plan_partial_aggs_no_python(spark):
    plan = (
        T.text_entropy(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
