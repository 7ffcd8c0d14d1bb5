"""robots_txt_eval: RFC 9309 parse + longest-match evaluation."""

import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.robots import (  # noqa: E402
    robots_rules,
    robots_txt_eval,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("robots-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def verdicts(spark):
    return {
        (r["host"], r["path"]): r
        for r in robots_txt_eval(spark, SF_DIR).collect()
    }


def test_prefix_rule_with_carveout(verdicts):
    """h0: /private/ disallowed, but the longer /private/public/ allow
    wins inside the carve-out (longest-match precedence)."""
    for (host, path), r in verdicts.items():
        if host != "h0.example":
            continue
        if path.startswith("/private/public/"):
            assert r["allowed"], path
        elif path.startswith("/private/"):
            assert not r["allowed"], path
        else:
            assert r["allowed"], path


def test_exact_agent_group_shadows_star(verdicts):
    """h1 names trainingbot explicitly, so the ``*`` group's
    Disallow: / must NOT apply; within the trainingbot group the
    *.pdf$ wildcard blocks pdf urls and everything else passes."""
    for (host, path), r in verdicts.items():
        if host != "h1.example":
            continue
        if path.endswith(".pdf"):
            assert not r["allowed"], path
        else:
            # under the * group everything would be blocked by
            # Disallow: / — these pass ONLY via group precedence
            assert r["allowed"], path


def test_allow_wins_length_ties_and_longest_wins(verdicts):
    """h2: Allow:/page vs Disallow:/pagex — '/page' matches only the
    allow; '/pagex' matches both and the LONGER disallow wins."""
    h2 = {p: r for (h, p), r in verdicts.items() if h == "h2.example"}
    if "/page" in h2:
        assert h2["/page"]["allowed"]
        assert h2["/page"]["winner_len"] == 5
    if "/pagex" in h2:
        assert not h2["/pagex"]["allowed"]
        assert h2["/pagex"]["winner_len"] == 6


def test_empty_disallow_and_missing_file_allow_everything(verdicts):
    for (host, path), r in verdicts.items():
        if host in ("h3.example", "h4.example"):
            assert r["allowed"], (host, path)
            assert r["winner_len"] == 0


def test_rules_parse_and_regex_translation(spark):
    rules = {
        (r["host"], r["pattern"]): r for r in robots_rules(spark).collect()
    }
    # h1's * group (Disallow: /) must be filtered out entirely
    assert ("h1.example", "/") not in rules
    # wildcard + anchor translation
    r = rules[("h1.example", "/*.pdf$")]
    assert r["rx"] == "^/.*\\.pdf$"
    assert not r["is_allow"] and r["rule_len"] == 7
    # empty Disallow (h3) contributes no rule
    assert not any(h == "h3.example" for h, _ in rules)
    # comments stripped: h0 has exactly its two rules
    h0 = [k for k in rules if k[0] == "h0.example"]
    assert sorted(p for _, p in h0) == ["/private/", "/private/public/"]


def test_custom_group_boundaries(spark):
    """A UA line after rules opens a NEW group; two consecutive UA
    lines share one group (RFC 9309 group assembly)."""
    files = [("x.example", (
        "User-agent: alpha\n"
        "User-agent: trainingbot\n"
        "Disallow: /a/\n"
        "User-agent: *\n"
        "Disallow: /b/\n"
    ))]
    rules = robots_rules(spark, files=files).collect()
    pats = sorted(r["pattern"] for r in rules)
    # trainingbot shares the first group (consecutive UA lines) ->
    # /a/ applies; the * group is shadowed -> /b/ does not
    assert pats == ["/a/"]
