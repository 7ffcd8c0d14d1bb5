"""RFC 9309 robots.txt: parse raw files and evaluate fetch paths.

ops/filtering.py's ``robots_filter`` gates on an already-structured
(host, disallow-prefix) rules table; this operator is the production
half it presumed: parse the raw ``robots.txt`` TEXT per host and
evaluate paths under the full RFC 9309 model (public spec):

* **groups** — consecutive ``User-agent`` lines open a group; the
  rules that follow belong to it (a UA line after a rule line starts
  a NEW group);
* **group selection** — if any group names our product token
  (case-insensitive ``{AGENT}``), exactly those groups apply and the
  ``*`` groups are IGNORED; otherwise the ``*`` groups apply; a host
  with no applicable group allows everything (so does a host with no
  robots.txt at all);
* **patterns** — ``*`` matches any octet sequence, a trailing ``$``
  anchors at URL end, everything else is literal prefix octets;
* **precedence** — the matching rule with the MOST OCTETS wins;
  Allow wins length ties; no matching rule means allowed;
* empty-value rules (``Disallow:``) match nothing (ignored);
  ``#`` comments stripped.

Everything is relational — no Python in either the parse or the
eval.  Group assembly is the classic sequence-parse-by-window: a
running sum over ``is_ua AND NOT lag(is_ua)`` numbers the groups;
pattern→regex translation is a deterministic regexp_replace chain
(escape regex metachars, ``*`` → ``.*``, trailing ``$`` → anchor)
spelled identically in both engines, so the oracle replays the whole
parse → translate → match → arg-max pipeline on the same derived
corpus.

The driver's tables carry no robots files, so both engines derive
the same five-host fixture set (each host exercising one RFC branch:
prefix+carve-out, exact-agent group with wildcard/$ rules, allow-tie
precedence, empty disallow, missing file) and the same fetch log
from ``documents``.  On a real corpus the parse runs over the
crawler's fetched (host, robots_txt) table and the derivation
disappears.

Scale design:

* the parse side is HOST-GRAINED: windows partition by host over
  <=100-line files, so state is O(hosts × lines) — never
  corpus-sized; the resulting rules relation is O(hosts ×
  rules/host) and is **broadcast** to the fetch log;
* the fetch side is one scan-local projection + broadcast join +
  one partial-aggregable struct-max per doc (the winner rule), the
  same shuffle shape as the prefix-only op it upgrades;
* per-row regex matching against a handful of per-host patterns is
  JVM-side inside codegen — no Python, no explode of the corpus.
  Audit check: ``robots-broadcast-rules-argmax``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdf_parser_spark.ops.common import load_table

AGENT = "trainingbot"

# Five fixture robots files, one RFC branch each (raw newlines are
# legal inside SQL string literals, so the SAME bytes feed DuckDB).
ROBOTS_FILES: list[tuple[str, str]] = [
    ("h0.example", """# prefix rule with a carve-out
User-agent: *
Disallow: /private/
Allow: /private/public/
"""),
    ("h1.example", """User-agent: trainingbot
Disallow: /*.pdf$
Allow: /docs/
User-agent: *
Disallow: /
"""),
    ("h2.example", """User-agent: *
Allow: /page
Disallow: /pagex
"""),
    ("h3.example", """User-agent: *
Disallow:
"""),
    # h4.example has no robots.txt at all
]

_PATHS = [
    "'/private/x-' || doc_id",
    "'/private/public/y-' || doc_id",
    "'/docs/file-' || doc_id",
    "'/reports/doc-' || doc_id || '.pdf'",
    "'/page'",
    "'/pagex'",
    "'/anything-' || doc_id",
    "'/'",
]


def _fetches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = "CASE doc_id % 8 " + " ".join(
        f"WHEN {i} THEN {p}" for i, p in enumerate(_PATHS)
    ) + " END"
    return docs.selectExpr(
        "doc_id",
        "'h' || (doc_id % 5) || '.example' AS host",
        f"{path} AS path",
    )


_FETCHES_SQL = (
    "fetches AS (\n"
    "  SELECT doc_id, 'h' || (doc_id % 5) || '.example' AS host,\n"
    "         (CASE doc_id % 8 "
    + " ".join(f"WHEN {i} THEN {p}" for i, p in enumerate(_PATHS))
    + " END) AS path\n  FROM documents\n)"
)


def robots_rules(spark: SparkSession,
                 files: list[tuple[str, str]] | None = None) -> DataFrame:
    """Parse (host, robots_txt) into the applicable-rule relation
    (host, is_allow, pattern, rx, rule_len) for ``AGENT`` — the
    production entry point (``files`` swaps in the crawler's real
    fetched table)."""
    raw = spark.createDataFrame(
        files or ROBOTS_FILES, "host string, robots_txt string"
    )
    lines = raw.select(
        "host",
        F.posexplode(F.split("robots_txt", "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*", "")).alias("clean"),
    ).selectExpr(
        "host",
        "ln",
        "lower(regexp_extract(clean, '^([A-Za-z-]+)\\\\s*:', 1)) AS directive",
        "trim(regexp_extract(clean, '^[A-Za-z-]+\\\\s*:\\\\s*(.*)$', 1)) AS value",
    )
    w = Window.partitionBy("host").orderBy("ln")
    grouped = (
        lines.withColumn("is_ua", F.col("directive") == "user-agent")
        .withColumn(
            "new_group",
            F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
        )
        .withColumn("gid", F.sum(F.col("new_group").cast("int")).over(w))
    )
    groups = grouped.groupBy("host", "gid").agg(
        F.max(
            F.col("is_ua") & (F.lower("value") == AGENT)
        ).alias("ua_exact"),
        F.max(F.col("is_ua") & (F.col("value") == "*")).alias("ua_star"),
    )
    wh = Window.partitionBy("host")
    applicable = (
        groups.withColumn("host_has_exact", F.max("ua_exact").over(wh))
        .filter(
            F.col("ua_exact")
            | (~F.col("host_has_exact") & F.col("ua_star"))
        )
        .select("host", "gid")
    )
    rules = (
        grouped.filter(
            F.col("directive").isin("allow", "disallow")
            & (F.col("value") != "")
        )
        .join(applicable, ["host", "gid"])
        .selectExpr(
            "host",
            "directive = 'allow' AS is_allow",
            "value AS pattern",
            "length(value) AS rule_len",
            # translate: trailing $ -> anchor; escape regex
            # metachars; * -> .*
            "'^' || replace("
            "  regexp_replace("
            "    CASE WHEN value LIKE '%$'"
            "         THEN substring(value, 1, length(value) - 1)"
            "         ELSE value END,"
            "    '([\\\\.\\\\^\\\\$\\\\+\\\\?\\\\(\\\\)\\\\{\\\\}\\\\[\\\\]\\\\|\\\\\\\\])',"
            "    '\\\\\\\\$1'),"
            "  '*', '.*')"
            " || CASE WHEN value LIKE '%$' THEN '$' ELSE '' END AS rx",
        )
    )
    return rules


def robots_txt_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, host, path, allowed, winner_len): full-RFC robots
    verdict per fetch — longest-match, allow-wins-ties, exact-agent
    group precedence, wildcard/$ patterns."""
    fetches = _fetches(spark, sf_dir)
    rules = robots_rules(spark)
    joined = fetches.join(F.broadcast(rules), "host", "left").withColumn(
        "hit", F.expr("path rlike rx")
    )
    # winner as ONE integer key: rule_len*2 + is_allow — max picks the
    # longest match, and among equal lengths the allow rule (RFC
    # allow-wins-ties); partial-aggregable, no struct comparison
    key = F.when(
        F.col("hit"),
        F.col("rule_len") * 2 + F.col("is_allow").cast("int"),
    )
    return (
        joined.groupBy("doc_id", "host", "path")
        .agg(F.max(key).alias("w"))
        .select(
            "doc_id",
            "host",
            "path",
            F.coalesce(F.col("w") % 2 == 1, F.lit(True)).alias("allowed"),
            (F.coalesce(F.col("w"), F.lit(0)) / 2).cast("long").alias("winner_len"),
        )
    )


def _files_values_sql() -> str:
    rows = ",\n    ".join(
        "('" + h + "', '" + txt.replace("'", "''") + "')"
        for h, txt in ROBOTS_FILES
    )
    return f"robots(host, robots_txt) AS (VALUES\n    {rows})"


ROBOTS_TXT_EVAL_SQL = f"""
WITH {_FETCHES_SQL},
{_files_values_sql()},
lines AS (
  SELECT host, ln, trim(regexp_replace(raw, '#.*', '')) AS clean FROM (
    SELECT host,
           generate_subscripts(string_split(robots_txt, chr(10)), 1) AS ln,
           unnest(string_split(robots_txt, chr(10))) AS raw
    FROM robots
  )
),
parsed AS (
  SELECT host, ln,
         lower(regexp_extract(clean, '^([A-Za-z-]+)\\s*:', 1)) AS directive,
         trim(regexp_extract(clean, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1)) AS value
  FROM lines
),
flagged AS (
  SELECT *,
         (is_ua AND NOT coalesce(
            lag(is_ua) OVER (PARTITION BY host ORDER BY ln), FALSE))
           AS new_group
  FROM (SELECT *, directive = 'user-agent' AS is_ua FROM parsed)
),
grouped AS (
  SELECT *,
         sum(CASE WHEN new_group THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY ln) AS gid
  FROM flagged
),
groups AS (
  SELECT host, gid,
         bool_or(is_ua AND lower(value) = '{AGENT}') AS ua_exact,
         bool_or(is_ua AND value = '*') AS ua_star
  FROM grouped GROUP BY host, gid
),
applicable AS (
  SELECT host, gid FROM (
    SELECT *, max(ua_exact) OVER (PARTITION BY host) AS host_has_exact
    FROM groups
  )
  WHERE ua_exact OR (NOT host_has_exact AND ua_star)
),
rules AS (
  SELECT g.host,
         g.directive = 'allow' AS is_allow,
         g.value AS pattern,
         length(g.value)::BIGINT AS rule_len,
         '^' || replace(
           regexp_replace(
             CASE WHEN g.value LIKE '%$'
                  THEN substring(g.value, 1, length(g.value) - 1)
                  ELSE g.value END,
             '([\\.\\^\\$\\+\\?\\(\\)\\{{\\}}\\[\\]\\|\\\\])',
             '\\\\\\1', 'g'),
           '*', '.*')
         || CASE WHEN g.value LIKE '%$' THEN '$' ELSE '' END AS rx
  FROM grouped g JOIN applicable USING (host, gid)
  WHERE g.directive IN ('allow', 'disallow') AND g.value <> ''
),
joined AS (
  SELECT f.doc_id, f.host, f.path, r.is_allow, r.rule_len,
         coalesce(regexp_matches(f.path, r.rx), FALSE) AS hit
  FROM fetches f LEFT JOIN rules r USING (host)
)
SELECT doc_id, host, path,
       coalesce(
         max(CASE WHEN hit THEN rule_len * 2
                  + (CASE WHEN is_allow THEN 1 ELSE 0 END) END) % 2 = 1,
         TRUE) AS allowed,
       (coalesce(
         max(CASE WHEN hit THEN rule_len * 2
                  + (CASE WHEN is_allow THEN 1 ELSE 0 END) END),
         0) // 2)::BIGINT AS winner_len
FROM joined
GROUP BY doc_id, host, path
"""


QUERIES = {
    "robots_txt_eval": (robots_txt_eval, ROBOTS_TXT_EVAL_SQL),
}
