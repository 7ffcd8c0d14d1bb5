"""url_blocklist_filter: category-domain + keyword URL admission."""

import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.blocklist import (  # noqa: E402
    BLOCKLIST,
    HARD_WORDS,
    SOFT_WORDS,
    url_blocklist_filter,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "blocklist-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def rows(spark):
    return {r["doc_id"]: r for r in url_blocklist_filter(spark, SF_DIR).collect()}


def test_listed_domains_always_blocked(rows):
    listed = {d for d, _ in BLOCKLIST}
    hit = 0
    for r in rows.values():
        if r["domain"] in listed:
            hit += 1
            assert r["category"] is not None
            assert not r["admitted"]
    assert hit > 0


def test_kw_score_matches_python(rows):
    for r in rows.values():
        score = sum(2 for w in HARD_WORDS if w in r["url"]) + sum(
            1 for w in SOFT_WORDS if w in r["url"]
        )
        assert r["kw_score"] == score
        assert r["admitted"] == (r["category"] is None and score < 2)


def test_both_verdicts_occur(rows):
    verdicts = {r["admitted"] for r in rows.values()}
    assert verdicts == {True, False}


def test_clean_domain_clean_path_admitted(rows):
    # doc with domain index >= 3 (unlisted) and path shape 3 or 4
    # (no planted words) must be admitted
    found = 0
    for doc_id, r in rows.items():
        if doc_id % 10 >= 3 and doc_id % 5 in (3, 4) and r["kw_score"] == 0:
            found += 1
            assert r["admitted"]
    assert found > 0
