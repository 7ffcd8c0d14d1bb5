"""pmi_top_pairs: integer-millibit PMI collocation ranking."""

import os
import sys
from collections import Counter

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.pmi import (  # noqa: E402
    MIN_PAIR,
    TOP_K,
    pmi_top_pairs,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("pmi-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _l2_mbits(x: int) -> int:
    e = x.bit_length() - 1
    p = 1 << e
    return e * 1000 + (x - p) * 1000 // p


def _py_pmi(corpus: dict[int, list[str]]):
    pairs = Counter()
    uni = Counter()
    n_u = n_b = 0
    for tok in corpus.values():
        uni.update(tok)
        n_u += len(tok)
        if len(tok) >= 2:
            pairs.update(zip(tok, tok[1:]))
            n_b += len(tok) - 1
    scored = []
    for (a, b), c_ab in pairs.items():
        if c_ab < MIN_PAIR:
            continue
        pmi = (
            _l2_mbits(c_ab) + 2 * _l2_mbits(n_u)
            - _l2_mbits(n_b) - _l2_mbits(uni[a]) - _l2_mbits(uni[b])
        )
        scored.append((a, b, c_ab, uni[a], uni[b], pmi))
    scored.sort(key=lambda r: (-r[5], r[0], r[1]))
    return scored[:TOP_K]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {
        r["doc_id"]: [t for t in (r["text"] or "").split(" ") if t]
        for r in df.select("doc_id", "text").collect()
    }


def test_matches_python_replay(spark, corpus):
    got = [
        (r["t0"], r["t1"], r["c_ab"], r["c_a"], r["c_b"], r["pmi_mb"])
        for r in pmi_top_pairs(spark, SF_DIR).collect()
    ]
    assert got == _py_pmi(corpus)


def test_crafted_collocation_outranks_frequent_pair(spark, tmp_path):
    """A pair whose parts appear ONLY together must outrank a pair of
    ubiquitous words that co-occur more often — the defining PMI
    property raw counts invert."""
    rows = []
    # "hong kong" appears 6 times, parts never apart
    for i in range(6):
        rows.append((i, f"hong kong filler{i} more{i} words{i}"))
    # "the of": both everywhere, co-occur 12 times
    for i in range(6, 30):
        rows.append((i, "the of the and of a the b of c the d"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = pmi_top_pairs(spark, str(tmp_path)).collect()
    by_pair = {(r["t0"], r["t1"]): r for r in got}
    rank = {p: i for i, p in enumerate(by_pair)}
    assert ("hong", "kong") in by_pair
    assert ("the", "of") in by_pair
    assert by_pair[("hong", "kong")]["c_ab"] < by_pair[("the", "of")]["c_ab"]
    assert (
        by_pair[("hong", "kong")]["pmi_mb"] > by_pair[("the", "of")]["pmi_mb"]
    )
    assert rank[("hong", "kong")] < rank[("the", "of")]
