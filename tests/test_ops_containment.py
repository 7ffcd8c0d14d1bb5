"""dedup_containment (ops/containment.py): the frequency-ordered
prefix filter must be LOSSLESS — its output equals a brute-force
all-pairs containment scan — including under boilerplate skew (one
shingle shared by every document) and at the exact τ = 4/5 boundary.
"""

import hashlib
import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.containment import (  # noqa: E402
    SNIP_MOD,
    SNIP_TOK,
    TAU_DEN,
    TAU_NUM,
    dedup_containment,
)
from pdf_parser_spark.ops.dedup import SHINGLE_N  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "containment-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _shingle_set(tokens: list[str]) -> set[int]:
    return {
        _h32(" ".join(tokens[i : i + SHINGLE_N]))
        for i in range(len(tokens) - SHINGLE_N + 1)
    }


def _brute_force(docs: dict[int, list[str]]) -> set[tuple]:
    """All-pairs τ-containment over the op's derived corpus
    (documents ∪ snippets), no blocking."""
    corpus = {}
    for doc_id, tok in docs.items():
        if len(tok) >= SHINGLE_N:
            corpus[doc_id] = tok
            if doc_id % SNIP_MOD == 0:
                corpus[doc_id + 2000000] = tok[:SNIP_TOK]
    sets = {d: _shingle_set(t) for d, t in corpus.items()}
    sets = {d: s for d, s in sets.items() if s}
    out = set()
    for da, sa in sets.items():
        for db, sb in sets.items():
            if da == db:
                continue
            inter = len(sa & sb)
            if TAU_DEN * inter >= TAU_NUM * len(sa):
                out.add(
                    (da, db, len(sa), inter, inter * 100 // len(sa))
                )
    return out


def _write_docs(spark, tmp_path, docs: dict[int, list[str]]) -> str:
    rows = [
        (doc_id, " ".join(tok), "en", f"src{doc_id % 3}", len(" ".join(tok)))
        for doc_id, tok in docs.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "fixture_sf")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_lossless_under_boilerplate_skew(spark, tmp_path):
    """Every document shares one ubiquitous boilerplate shingle (max
    document frequency).  The frequency-ascending prefix order must
    keep it OUT of the probe prefixes, yet the result must still equal
    the unblocked brute force — no pair lost to the skew hardening."""
    boiler = ["subscribe", "to", "newsletter"]
    docs = {}
    for i in range(40):
        body = [f"w{i}_{j}" for j in range(10 + i % 7)]
        docs[i] = boiler + body
    # containment ground truth: doc 50 is doc 3's body with one extra
    # shingle's worth of prefix tokens; doc 51 ⊂ doc 5 exactly
    docs[50] = ["extra", "lead", "tokens"] + docs[3]
    docs[51] = docs[5][: SHINGLE_N + 4]
    sf = _write_docs(spark, tmp_path, docs)
    got = {
        tuple(r)
        for r in dedup_containment(spark, sf).collect()
    }
    assert got == _brute_force(docs)
    assert len(got) > 0  # the injected snippets alone guarantee pairs


def test_exact_tau_boundary_pair_is_kept(spark, tmp_path):
    """A pair at containment EXACTLY τ = 4/5 must be reported: the
    integer predicate (5·inter ≥ 4·n) has no float-rounding slack."""
    t = [f"t{j}" for j in range(7)]  # 5 shingles: t0t1t2 .. t4t5t6
    docs = {
        1: t,                                   # A: all 5 shingles
        2: t[:6] + ["zz1", "zz2", "zz3"],       # B: 4 of A's 5
    }
    sf = _write_docs(spark, tmp_path, docs)
    got = {
        (r["contained_doc"], r["container_doc"], r["containment_x100"])
        for r in dedup_containment(spark, sf).collect()
    }
    assert (1, 2, 80) in got
    brute = {(a, b, c100) for a, b, _n, _i, c100 in _brute_force(docs)}
    assert {(a, b, c) for a, b, c in got} == brute
