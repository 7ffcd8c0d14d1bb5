"""linkrank job: href harvesting edge cases, PDF payload sniffing,
and the end-to-end host PageRank checked against an independent
pure-Python reimplementation of the integer recurrence."""

import datetime
import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.html.links import extract_hrefs, outlink_hosts  # noqa: E402
from pdf_parser_spark.ops.linkgraph import PR_SCALE  # noqa: E402
from jobs.linkrank import host_edges, host_ranks  # noqa: E402


def test_extract_hrefs_quoting_and_filtering():
    markup = (
        '<a href="http://x.test/a">A</a>'
        "<a href='http://y.test/b'>B</a>"
        "<a href=http://z.test/c>C</a>"
        '<a class="k" href="/rel">rel</a>'
        '<a href="#frag">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a href="mailto:x@y.z">skip</a>'
        "<a name=anchor>no href</a>"
        '<a href="">empty</a>'
    )
    assert extract_hrefs(markup) == [
        "http://x.test/a",
        "http://y.test/b",
        "http://z.test/c",
        "/rel",
    ]


def test_outlink_hosts_resolution_and_self_loop():
    markup = (
        '<a href="/local">same host</a>'
        '<a href="http://other.test/p">other</a>'
        '<a href="https://other.test/q">dup host</a>'
        '<a href="ftp://files.test/f">non-http</a>'
        '<a href="HTTP://UPPER.test/">scheme case</a>'
    )
    hosts = outlink_hosts("http://me.test/page", markup)
    assert hosts == ["other.test", "upper.test"]


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "linkrank-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


_TS = datetime.datetime(2025, 1, 1)


def _pages(spark):
    def page(url, body):
        return (url, _TS, bytearray(body), "", "en")

    rows = [
        page(
            "http://a.test/p1",
            b'<html><a href="http://b.test/x">b</a>'
            b'<a href="//c.test/y">c</a>'
            b'<a href="/self">self</a></html>',
        ),
        page("http://b.test/p", b'<a href="http://c.test/z">c</a>'),
        page(
            "http://c.test/p",
            b'<a href="http://a.test/">a</a><a href="#top">frag</a>',
        ),
        page("http://a.test/pdf", b"%PDF-1.4 fake (not parsed for links)"),
    ]
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def _py_pagerank(edges, iters=3):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    init = PR_SCALE // len(nodes)
    base = (init * 15) // 100
    pr = {v: init for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] // outdeg[s]
        pr = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    return pr, outdeg


def test_host_ranks_match_python_recurrence(spark):
    pages = _pages(spark)
    edges = {(r.src, r.dst) for r in host_edges(pages).collect()}
    assert edges == {
        ("a.test", "b.test"),
        ("a.test", "c.test"),
        ("b.test", "c.test"),
        ("c.test", "a.test"),
    }
    expected_pr, expected_out = _py_pagerank(sorted(edges))
    got = {r.host: (r.pagerank_e9, r.out_degree)
           for r in host_ranks(pages).collect()}
    assert got == {
        v: (expected_pr[v], expected_out.get(v, 0)) for v in expected_pr
    }


def _py_hyperball(edges, radius=3):
    """Bit-exact twin of the integer HyperBall recurrence over
    string-host edges (same md5 registers as ops/centrality.py)."""
    from hashlib import md5

    from pdf_parser_spark.ops.centrality import (
        ALPHA_DEN, ALPHA_NUM, HC_SCALE, M, P,
    )

    def h32(s):
        return int(md5(s.encode()).hexdigest()[:8], 16)

    def est(regs):
        s = sum(1 << (P - r) for r in regs)
        return ((ALPHA_NUM * M * M) << P) // (ALPHA_DEN * s)

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    regs = {}
    for v in nodes:
        r = [0] * M
        raw = h32(f"hr|{v}")
        r[h32(f"hb|{v}") % M] = min(33 - max(raw.bit_length(), 1), P)
        regs[v] = r
    in_nbrs = {v: [] for v in nodes}
    for s, d in edges:
        in_nbrs[d].append(s)
    ests = {v: [est(regs[v])] for v in nodes}
    for _ in range(radius):
        regs = {
            v: [
                max(regs[v][b], *[regs[u][b] for u in in_nbrs[v]] or [0])
                for b in range(M)
            ]
            for v in nodes
        }
        for v in nodes:
            ests[v].append(est(regs[v]))
    return {
        v: sum(
            ((e[t] - e[t - 1]) * HC_SCALE) // t
            for t in range(1, radius + 1)
        )
        for v, e in ests.items()
    }


def test_host_ranks_harmonic_matches_python_twin(spark):
    pages = _pages(spark)
    edges = sorted(
        {(r.src, r.dst) for r in host_edges(pages).collect()}
    )
    expected = _py_hyperball(edges)
    got = {
        r.host: r.harmonic_e6
        for r in host_ranks(pages, harmonic=True).collect()
    }
    assert got == expected
    # pagerank columns survive the harmonic join
    cols = host_ranks(pages, harmonic=True).columns
    assert cols == ["host", "pagerank_e9", "out_degree", "harmonic_e6"]


def test_outlink_hosts_total_on_hostile_markup():
    """Totality: arbitrary markup and hostile hrefs must never raise
    (the UDF runs inside the extraction envelope where a raised row
    would fail the task, not the row)."""
    import random

    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=400))
    def _prop(markup):
        hosts = outlink_hosts("http://me.test/p", markup)
        assert isinstance(hosts, list)

    _prop()

    rng = random.Random(7)
    hostile = [
        '<a href="http://[::1">unclosed ipv6 bracket</a>',
        '<a href="http://a:b:c/">bad port</a>',
        "<a href=" + "x" * 5000 + ">huge</a>",
        '<a href="https://">no host</a>',
    ]
    for h in hostile:
        outlink_hosts("http://me.test/p", h)
    blob = bytes(rng.randint(0, 255) for _ in range(4096)).decode("latin-1")
    outlink_hosts("http://me.test/p", blob)
