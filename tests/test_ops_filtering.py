"""Semantic invariants for the admission-control operators
(ops/filtering.py) — beyond the value-exact parity gate, pin the
properties that make each operator *correct as a curation stage*."""

import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops import filtering  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("ops-filtering-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_url_host_filter_blocks_subdomains(spark):
    from pdf_parser_spark.ops.psl import registered_domain

    rows = filtering.url_host_filter(spark, SF_DIR).collect()
    by_id = {r.doc_id: r for r in rows}
    blocked_domains = {
        f"{s}-web.{suf}"
        for s in filtering.BLOCKED_SOURCES
        for suf in filtering.TLD_SUFFIXES
    }
    saw_subdomain_block = False
    saw_two_level_tld = False
    for r in rows:
        # the in-plan PSL derivation agrees with the pure-Python twin
        assert r.reg_domain == registered_domain(r.host)
        if r.reg_domain in blocked_domains:
            assert not r.kept and r.blocked_by == r.reg_domain
            if r.host.startswith("news."):
                saw_subdomain_block = True
            if r.reg_domain.endswith((".co.uk", ".com.au")):
                saw_two_level_tld = True
        else:
            assert r.kept and r.blocked_by == ""
    # both the subdomain rule and a two-level public suffix (where the
    # old last-N-labels heuristic breaks) must have been exercised
    assert saw_subdomain_block
    assert saw_two_level_tld
    assert len(by_id) == len(rows)  # one verdict per document


def test_incremental_dedup_admits_each_hash_once(spark):
    rows = filtering.incremental_dedup(spark, SF_DIR).collect()
    admitted = [r for r in rows if r.admitted]
    # an admitted doc is never a corpus dup, and each admitted hash is
    # unique (the batch-internal keeper collapses within-batch dups)
    assert all(not r.dup_of_corpus for r in admitted)
    hashes = [r.text_md5 for r in admitted]
    assert len(hashes) == len(set(hashes))
    # every non-corpus-dup hash admits exactly its min-doc_id row
    import collections

    per_hash = collections.defaultdict(list)
    for r in rows:
        if not r.dup_of_corpus:
            per_hash[r.text_md5].append(r)
    for group in per_hash.values():
        keeper = min(g.doc_id for g in group)
        for g in group:
            assert g.admitted == (g.doc_id == keeper)


def test_quality_classifier_score_matches_features(spark):
    rows = filtering.quality_classifier(spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        score = (
            filtering.W_TOKENS * min(r.n_tokens, filtering.TOKEN_CAP)
            + filtering.W_TYPE_RATIO * r.type_ratio_x100
            + filtering.W_MEAN_LEN * r.mean_len_x10
            + filtering.QUALITY_BIAS
        )
        assert r.quality_score == score
        assert r.kept == (score >= filtering.QUALITY_THRESHOLD)
    # the gate must actually split the corpus (not all-keep/all-drop)
    kept = sum(1 for r in rows if r.kept)
    assert 0 < kept < len(rows)


def test_doclen_percentiles_match_bruteforce(spark):
    import duckdb

    rows = {r.lang: r for r in filtering.doclen_percentiles(spark, SF_DIR).collect()}
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    import collections
    import math

    per_lang = collections.defaultdict(list)
    for lang, n in docs:
        per_lang[lang].append(n)
    for lang, vals in per_lang.items():
        vals.sort()
        r = rows[lang]
        assert r.n_docs == len(vals)
        for p in filtering.PCT_POINTS:
            rank = math.ceil(len(vals) * p / 100)  # 1-based
            assert getattr(r, f"p{p}") == vals[rank - 1], (lang, p)


def test_robots_filter_disallow_prefix_semantics(spark):
    rows = filtering.robots_filter(spark, SF_DIR).collect()
    assert rows
    saw_block = saw_open_host = False
    for r in rows:
        disallowed = (
            (r.host % 3 == 0 and r.path.startswith("/private"))
            or (r.host % 5 == 0 and r.path.startswith("/tmp"))
            or (r.host == 7 and r.path.startswith("/articles"))
        )
        assert r.allowed == (not disallowed), (r.host, r.path, r.allowed)
        if disallowed:
            saw_block = True
        if r.host % 3 and r.host % 5 and r.host != 7:
            assert r.allowed  # rule-free hosts admit everything
            saw_open_host = True
    assert saw_block and saw_open_host


def test_gopher_and_c4_semantics(spark):
    g = {r.doc_id: r for r in
         __import__("pdf_parser_spark.ops.heuristics", fromlist=["x"])
         .gopher_quality_filter(spark, SF_DIR).collect()}
    assert g
    for r in g.values():
        # flags must agree with the emitted statistics
        from pdf_parser_spark.ops import heuristics as H
        expect = (H.G_MIN_WORDS <= r.n_words <= H.G_MAX_WORDS
                  and H.G_MIN_MWL_E2 <= r.mean_word_len_e2 <= H.G_MAX_MWL_E2
                  and r.symbol_e4 < H.G_MAX_SYMBOL_E4
                  and r.bullet_e4 < H.G_MAX_BULLET_E4
                  and r.ellipsis_e4 < H.G_MAX_ELLIPSIS_E4
                  and r.alpha_e4 > H.G_MIN_ALPHA_E4
                  and r.n_stop >= H.G_MIN_STOPWORDS)
        assert r.passes == expect, r
    from pdf_parser_spark.ops.heuristics import c4_line_filter
    c = c4_line_filter(spark, SF_DIR).collect()
    assert c
    for r in c:
        assert 0 <= r.n_kept <= r.n_lines
        assert r.doc_kept == (r.n_kept >= 2)
