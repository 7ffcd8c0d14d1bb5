"""bm25_retrieval: exact-integer Okapi BM25 query top-k."""

import math
import os
import sys
from collections import Counter

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.bm25 import (  # noqa: E402
    B_M,
    K1_M,
    QUERY_LEN,
    QUERY_MOD,
    TOP_K,
    bm25_retrieval,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("bm25-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def rows(spark):
    return bm25_retrieval(spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {}
    for r in df.select("doc_id", "text").collect():
        tok = [t for t in (r["text"] or "").split(" ") if t]
        if tok:
            out[r["doc_id"]] = tok
    return out


def _l2_mbits(x: int) -> int:
    e = x.bit_length() - 1
    p = 1 << e
    return e * 1000 + (x - p) * 1000 // p


def _py_bm25(corpus):
    """Independent pure-Python replay of the integer recurrence."""
    n = len(corpus)
    sum_dl = sum(len(t) for t in corpus.values())
    avgdl_mil = sum_dl * 1000 // n
    queries = {
        did: set(tok[:QUERY_LEN])
        for did, tok in corpus.items()
        if did % QUERY_MOD == 0
    }
    qvocab = set().union(*queries.values())
    tf = {
        did: Counter(t for t in tok if t in qvocab)
        for did, tok in corpus.items()
    }
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for did, c in tf.items():
            s = 0
            for t in terms:
                if c.get(t, 0) == 0:
                    continue
                idf = _l2_mbits(n + 1) - _l2_mbits(df[t] + 1)
                dl = len(corpus[did])
                norm = 1000 - B_M + (B_M * dl * 1000) // avgdl_mil
                s += (idf * c[t] * (K1_M + 1000)) // (
                    c[t] * 1000 + (K1_M * norm) // 1000
                )
            if s > 0 or c and any(t in c for t in terms):
                scores[did] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = ranked[:TOP_K]
    return out


def test_matches_python_replay(rows, corpus):
    want = _py_bm25(corpus)
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score_mb"]))
    assert set(got) == set(want)
    for qid in want:
        assert got[qid] == want[qid], qid


def test_crafted_corpus_bm25_semantics(spark, tmp_path):
    """On a corpus built to separate the BM25 ingredients: the
    rare-term match outranks the common-term stuffer (idf), and at
    equal tf the shorter document outranks the longer (length
    normalization).  The synthetic driver corpus can't show either —
    its vocabulary is so small that every query term is ubiquitous."""
    filler = " ".join(f"pad{i}" for i in range(10))
    rows = [
        # doc 0 seeds the query: (zebra, alpha, beta, gamma)
        (0, "zebra alpha beta gamma"),
        # rare-term match, short
        (1, "zebra " + " ".join(f"x{i}" for i in range(5))),
        # same rare term, same tf, much longer -> must rank below doc 1
        (2, "zebra " + filler + " " + filler),
        # common-term stuffer: every query term EXCEPT zebra, many times
        (3, " ".join(["alpha beta gamma"] * 8)),
    ] + [
        # background docs: make alpha/beta/gamma ubiquitous (high df)
        (i, f"alpha beta gamma filler{i} other{i}") for i in range(4, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in bm25_retrieval(spark, str(tmp_path)).collect()
        if r["query_id"] == 0
    }
    # the seed doc matches all four terms and is short: rank 1
    assert got[0]["rank"] == 1
    # idf: one rare-term hit beats eight-fold common-term stuffing
    assert got[1]["score_mb"] > got[3]["score_mb"]
    # length normalization: equal tf, shorter doc scores higher
    assert got[1]["score_mb"] > got[2]["score_mb"]


def test_ranks_are_dense_and_scores_monotone(rows):
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_mb"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)
