"""Winnowing fingerprints (ops/winnow.py).

Pins: (a) the SIGMOD'03 local guarantee — two documents sharing a
contiguous token run of length >= W + K - 1 share at least one
fingerprint; (b) bit-exact agreement with an independent pure-Python
replay of the selection on the real corpus; (c) agreement with the
DuckDB list-comprehension oracle; (d) the plan is a scan-local Arrow
map with zero exchanges.
"""

import hashlib
import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import winnow  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("winnow-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _py_winnow(text: str):
    """Independent replay of the selection (not the module's code)."""
    toks = text.split()
    k, w = winnow.WINNOW_K, winnow.WINNOW_W
    g = len(toks) - k + 1
    if g < 1:
        return 0, set()
    gh = [
        int(
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8],
            16,
        )
        for i in range(g)
    ]
    if g <= w:
        return g, {min(gh)}
    return g, {min(gh[j : j + w]) for j in range(g - w + 1)}


def test_shared_run_guarantee(spark, tmp_path):
    import pandas as pd

    run = " ".join(f"shared{i}" for i in range(winnow.WINNOW_W
                                               + winnow.WINNOW_K - 1))
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "aa bb cc dd ee " + run + " ff gg hh",
                run + " zz yy xx ww vv uu tt ss rr qq",
                # unrelated doc: no overlap, disjoint fingerprints
                " ".join(f"other{i}" for i in range(30)),
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    d = str(tmp_path)
    rows.to_parquet(f"{d}/documents.parquet")
    out = {
        r.doc_id: r for r in winnow.winnow_fingerprint(spark, d).collect()
    }
    _, fp1 = _py_winnow(rows.text[0])
    _, fp2 = _py_winnow(rows.text[1])
    assert fp1 & fp2, "shared 8-token run must share a fingerprint"
    # the op's digests agree with the replay sets
    for doc_id, text in zip(rows.doc_id, rows.text):
        g, fps = _py_winnow(text)
        want = hashlib.md5(
            ",".join(str(x) for x in sorted(fps)).encode()
        ).hexdigest()
        r = out[doc_id]
        assert (r.n_grams, r.n_fp, r.fp_md5) == (g, len(fps), want)
        assert (r.min_fp, r.max_fp) == (min(fps), max(fps))


def test_replay_and_oracle_on_corpus(spark):
    got = {
        r.doc_id: (r.n_grams, r.n_fp, r.fp_md5, r.min_fp, r.max_fp)
        for r in winnow.winnow_fingerprint(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = {
        r[0]: tuple(r[1:])
        for r in con.sql(winnow.WINNOW_FINGERPRINT_SQL).fetchall()
    }
    assert got == oracle
    texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    for doc_id, (g, n_fp, digest, _mn, _mx) in got.items():
        pg, fps = _py_winnow(texts[doc_id])
        want = hashlib.md5(
            ",".join(str(x) for x in sorted(fps)).encode()
        ).hexdigest()
        assert (g, n_fp, digest) == (pg, len(fps), want), doc_id


def _py_candidates(texts: dict):
    """Independent replay of the MOSS index join: df-cap then pair
    counting over the per-doc fingerprint sets."""
    from collections import Counter, defaultdict

    fps = {d: _py_winnow(t)[1] for d, t in texts.items()}
    df = Counter(f for s in fps.values() for f in s)
    buckets = defaultdict(list)
    for d, s in fps.items():
        for f in s:
            if df[f] <= winnow.WINNOW_DF_CAP:
                buckets[f].append(d)
    shared = Counter()
    for members in buckets.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                shared[(a, b)] += 1
    return {
        p: c for p, c in shared.items() if c >= winnow.WINNOW_MIN_SHARED
    }


def test_span_candidates_find_long_shared_run(spark, tmp_path):
    import pandas as pd

    run = " ".join(f"plag{i}" for i in range(25))
    texts = {
        1: "intro words here then " + run + " and a closing remark",
        2: run + " " + " ".join(f"tail{i}" for i in range(20)),
        3: " ".join(f"noise{i}" for i in range(40)),
    }
    rows = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [0] * 3,
        }
    )
    d = str(tmp_path)
    rows.to_parquet(f"{d}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b): r.n_shared_fp
        for r in winnow.winnow_span_candidates(spark, d).collect()
    }
    want = _py_candidates(texts)
    assert got == want
    assert (1, 2) in got and got[(1, 2)] >= winnow.WINNOW_MIN_SHARED
    assert not any(3 in p for p in got)


def test_span_candidates_replay_on_corpus(spark):
    got = {
        (r.doc_a, r.doc_b): r.n_shared_fp
        for r in winnow.winnow_span_candidates(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    assert got == _py_candidates(texts)
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.sql(winnow.WINNOW_SPAN_CANDIDATES_SQL).fetchall()
    }
    assert got == oracle


def test_span_candidates_plan_bounded_join(spark):
    plan = (
        winnow.winnow_span_candidates(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the index joins shuffle only (fp, doc_id) BIGINTs — never text
    assert all(
        "text" not in seg[:300]
        for seg in plan.split("Exchange hashpartitioning")[1:]
    )


def test_plan_scan_local_zero_shuffle(spark):
    plan = (
        winnow.winnow_fingerprint(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
