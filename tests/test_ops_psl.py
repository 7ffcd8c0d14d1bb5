"""Public-suffix-list registered-domain derivation (ops/psl.py).

Three implementations must agree everywhere: the pure-Python twin,
the Spark explode→broadcast-join plan, and the DuckDB CTE fragment
used by oracles.  The pure-Python twin is itself pinned against the
applicable vectors from the public publicsuffix.org test file
(hosts pre-normalized: lowercase, no empty labels — the pipeline's
canonicalization guarantees both upstream).
"""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.psl import (  # noqa: E402
    PSL_SNAPSHOT,
    psl_join_sql,
    registered_domain,
    with_registered_domain,
)

# (host, expected registered domain) — the publicsuffix.org
# checkPublicSuffix vectors whose rules the snapshot carries, plus the
# unlisted-TLD implicit-'*' cases.
OFFICIAL_VECTORS = [
    # unlisted TLD → implicit '*' rule
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # flat TLD
    ("com", None),
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("b.example.com", "example.com"),
    # two-level registry (.co.uk) vs flat (.org) — the heuristic killer
    ("uk", None),
    ("co.uk", None),
    ("example.co.uk", "example.co.uk"),
    ("b.example.co.uk", "example.co.uk"),
    ("a.b.example.co.uk", "example.co.uk"),
    ("example.org", "example.org"),
    ("blog.example.org", "example.org"),
    # jp incl. the kawasaki wildcard + exception triple
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kawasaki.jp", None),
    ("test.kawasaki.jp", None),
    # '*.kawasaki.jp' makes test.kawasaki.jp itself the public suffix,
    # so the 4-label host is the registrant
    ("www.test.kawasaki.jp", "www.test.kawasaki.jp"),
    ("x.www.test.kawasaki.jp", "www.test.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("www.city.kawasaki.jp", "city.kawasaki.jp"),
    # ck: pure-wildcard registry with an exception
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # au two-level
    ("com.au", None),
    ("example.com.au", "example.com.au"),
    ("www.example.com.au", "example.com.au"),
]

HOSTS = [h for h, _ in OFFICIAL_VECTORS]


@pytest.mark.parametrize("host,expected", OFFICIAL_VECTORS)
def test_python_twin_official_vectors(host, expected):
    assert registered_domain(host) == expected


def test_snapshot_has_every_rule_shape():
    kinds = {
        "wildcard" if r.startswith("*.") else "exception" if r.startswith("!")
        else "normal"
        for r in PSL_SNAPSHOT
    }
    assert kinds == {"normal", "wildcard", "exception"}


def test_duckdb_fragment_matches_python_twin():
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{h}')" for i, h in enumerate(HOSTS))
    q = (
        f"WITH pages(doc_id, host) AS (VALUES {vals}),\n"
        f"{psl_join_sql('pages')}\n"
        "SELECT doc_id, host, reg_domain FROM pages_psl ORDER BY doc_id"
    )
    for _, host, reg in con.execute(q).fetchall():
        assert reg == registered_domain(host), host


# -- the FULL vendored publicsuffix.org list (r5) ------------------------------

def _official_vector_file():
    """(host, expected) pairs from the vendored publicsuffix.org
    test_psl.txt (public domain, CC0), skipping null-input and
    leading-dot rows (the pipeline pre-normalizes hosts: lowercase,
    no empty labels) and IDNA-normalizing unicode rows to the punycode
    forms the pipeline carries."""
    import re

    from pdf_parser_spark.ops.psl import PSL_DATA_PATH

    def norm(h):
        h = h.lower()
        return ".".join(
            lab.encode("idna").decode("ascii")
            if any(ord(c) > 127 for c in lab) else lab
            for lab in h.split(".")
        )

    path = os.path.join(os.path.dirname(PSL_DATA_PATH), "test_psl.txt")
    pat = re.compile(r"^checkPublicSuffix\((null|'([^']*)'), (null|'([^']*)')\);")
    out = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            m = pat.match(line.strip())
            if not m:
                continue
            host = m.group(2) if m.group(1) != "null" else None
            want = m.group(4) if m.group(3) != "null" else None
            if host is None or host.startswith("."):
                continue
            out.append((norm(host), norm(want) if want is not None else None))
    return out


def test_full_list_loads_and_is_complete():
    from pdf_parser_spark.ops.psl import MAX_RULE_LABELS, load_psl_file

    rules = load_psl_file()
    assert len(rules) > 9000  # the real ~9.5k-rule file, not a subset
    assert any(r.startswith("*.") for r in rules)
    assert any(r.startswith("!") for r in rules)
    assert all(ord(c) < 128 for r in rules for c in r)  # punycode'd
    assert max(
        (r.lstrip("!").replace("*.", "", 1)).count(".") + 1 for r in rules
    ) == MAX_RULE_LABELS


def test_python_twin_passes_complete_official_vector_file():
    from pdf_parser_spark.ops.psl import load_psl_file

    vectors = _official_vector_file()
    assert len(vectors) >= 70  # the whole applicable file, not a sample
    rules = load_psl_file()
    for host, want in vectors:
        assert registered_domain(host, rules=rules) == want, host


def test_duckdb_fragment_passes_official_vectors_on_full_list():
    from pdf_parser_spark.ops.psl import load_psl_file

    vectors = _official_vector_file()
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{h}')" for i, (h, _) in enumerate(vectors))
    q = (
        f"WITH pages(doc_id, host) AS (VALUES {vals}),\n"
        f"{psl_join_sql('pages', rules=load_psl_file())}\n"
        "SELECT doc_id, reg_domain FROM pages_psl ORDER BY doc_id"
    )
    for (i, reg) in con.execute(q).fetchall():
        assert reg == vectors[i][1], vectors[i]


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("psl-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_spark_plan_passes_official_vectors_on_full_list(spark):
    from pdf_parser_spark.ops.psl import load_psl_file

    vectors = _official_vector_file()
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(vectors)], "doc_id INT, host STRING"
    )
    out = with_registered_domain(df, rules=load_psl_file())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    got = {r.doc_id: r.reg_domain for r in out.collect()}
    for i, (h, want) in enumerate(vectors):
        assert got[i] == want, h


def test_spark_plan_matches_python_twin(spark):
    df = spark.createDataFrame(
        list(enumerate(HOSTS)), "doc_id INT, host STRING"
    )
    out = with_registered_domain(df)
    rows = out.collect()
    assert len(rows) == len(HOSTS)  # fan-out re-collapsed, one row per host
    for r in rows:
        assert r.reg_domain == registered_domain(r.host), r.host


def test_spark_plan_broadcasts_rules(spark):
    df = spark.createDataFrame(
        list(enumerate(HOSTS)), "doc_id INT, host STRING"
    )
    plan = with_registered_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- property tests: three-way agreement on generated hosts -------------------

try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

# label pool mixing PSL rule labels (so matches happen), rule bases,
# exception labels, and unrelated labels (so the implicit '*' fires)
_LABELS = [
    "com", "org", "uk", "co", "jp", "ac", "kawasaki", "city", "ck",
    "www", "test", "example", "blog", "a", "b", "x1", "deep",
]

if _HAS_HYPOTHESIS:

    @given(
        st.lists(st.sampled_from(_LABELS), min_size=1, max_size=7).map(
            ".".join
        )
    )
    @settings(max_examples=500, deadline=None)
    def test_duckdb_fragment_agrees_on_generated_hosts(host):
        import duckdb

        con = duckdb.connect()
        q = (
            f"WITH pages(doc_id, host) AS (VALUES (0, '{host}')),\n"
            f"{psl_join_sql('pages')}\n"
            "SELECT reg_domain FROM pages_psl"
        )
        (reg,) = con.execute(q).fetchone()
        assert reg == registered_domain(host), host


def test_spark_plan_agrees_on_generated_host_corpus(spark):
    """One Spark round-trip over a 300-host pseudo-random corpus drawn
    from the same label pool (per-example Spark jobs would be 100x
    slower than the hypothesis loop above)."""
    import random

    rng = random.Random(20260819)
    hosts = [
        ".".join(rng.choices(_LABELS, k=rng.randint(1, 7)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        list(enumerate(hosts)), "doc_id INT, host STRING"
    )
    for r in with_registered_domain(df).collect():
        assert r.reg_domain == registered_domain(r.host), r.host
