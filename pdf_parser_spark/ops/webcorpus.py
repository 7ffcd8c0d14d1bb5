"""Web-corpus snapshot curation: canonical-URL dedup, duplicated-line
(boilerplate) removal, and per-stratum quota sampling.

These are the crawl-shaped curation stages between ingest and model
training: collapsing re-crawled snapshots to one record per canonical
url, stripping lines that repeat across many documents (CCNet-style
boilerplate removal at line granularity), and drawing a deterministic
fixed-quota sample per stratum for eval slices.  The driver's sf
tables carry no urls, so each operator derives its crawl-shaped input
deterministically from ``documents`` (same pattern as
``ops.common.dedup_corpus``) — both the Spark plan and the DuckDB
oracle build the identical derived table, so the value-exact gate
still holds.

All plans are built-in JVM functions (WholeStageCodegen, no Python);
scale notes per operator explain the 100 TB shuffle story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import (
    h32,
    h32_sql,
    load_table,
    tokens,
    tokens_sql,
)

# url_dedup: canonical-key collision modulus (several doc_ids share a
# canonical url, so the dedup actually collapses rows)
URL_KEY_MOD = 250
# line_dedup: words per synthetic "line" and the injected boilerplate
LINE_WIDTH = 4
BOILER_TOKENS = ("subscribe", "newsletter", "follow", "share")
BOILER_MOD = 3
# stratified_sample: per-lang quota and hash pre-filter margin
STRATUM_QUOTA = 30
PREFILTER_MARGIN = 3
PREFILTER_BUCKETS = 1000


# ---------------------------------------------------------------------------
# url_dedup — collapse re-crawled snapshots to one record per canonical url
# ---------------------------------------------------------------------------

def _canonicalize(url):
    """Canonical url: strip #fragment, strip a utm_* query, strip the
    trailing slash, lowercase the scheme+host (path stays
    case-sensitive).  Four regexps — pure codegen, no Python."""
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, r"\?utm_.*$", "")
    u = F.regexp_replace(u, "/$", "")
    head = F.regexp_extract(u, "^[^/]*//[^/]*", 0)
    tail = F.regexp_extract(u, "^[^/]*//[^/]*(.*)$", 1)
    return F.concat(F.lower(head), tail)


def _canonicalize_sql(expr: str) -> str:
    u = f"regexp_replace({expr}, '#.*$', '')"
    u = f"regexp_replace({u}, '\\?utm_.*$', '')"
    u = f"regexp_replace({u}, '/$', '')"
    return (
        f"lower(regexp_extract({u}, '^[^/]*//[^/]*', 0)) || "
        f"regexp_extract({u}, '^[^/]*//[^/]*(.*)$', 1)"
    )


def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL snapshot dedup: each document yields two crawl
    snapshots of the same page under messy url spellings (fragment,
    utm query, trailing slash, shouty host) at different crawl times;
    keep the most recent snapshot per canonical url.

    Scale: canonicalization is narrow codegen; the collapse is ONE
    groupBy on the canonical url — near-unique keys, so the
    aggregation is skew-free and map-side combinable.  ``max_by``
    keeps the arg-max snapshot without a self-join back (the common
    window-function spelling would sort every group; max_by is a
    streaming aggregate).  ts_key is unique by construction, so the
    arg-max is deterministic on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.concat(F.lit("/page/"), (F.col("doc_id") % URL_KEY_MOD).cast("string"))
    clean = F.concat(F.lit("https://"), host, path)
    messy = F.concat(
        F.lit("HTTPS://"), F.upper(host), path, F.lit("/?utm_source=feed#top")
    )
    snaps = docs.select(
        F.explode(
            F.array(
                F.struct(
                    clean.alias("raw_url"),
                    (F.col("doc_id") * 2).alias("ts_key"),
                ),
                F.struct(
                    messy.alias("raw_url"),
                    (F.col("doc_id") * 2 + 1).alias("ts_key"),
                ),
            )
        ).alias("s")
    ).select("s.raw_url", "s.ts_key")
    return (
        snaps.groupBy(_canonicalize(F.col("raw_url")).alias("url"))
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            F.max("ts_key").alias("latest_ts_key"),
            F.max_by("raw_url", "ts_key").alias("latest_raw_url"),
            F.min("ts_key").alias("first_ts_key"),
        )
    )


URL_DEDUP_SQL = f"""
WITH snaps AS (
  SELECT 'https://' || source || '.example.com/page/' || (doc_id % {URL_KEY_MOD})::VARCHAR
           AS raw_url,
         CAST(doc_id * 2 AS BIGINT) AS ts_key
  FROM documents
  UNION ALL
  SELECT 'HTTPS://' || upper(source || '.example.com') || '/page/'
           || (doc_id % {URL_KEY_MOD})::VARCHAR || '/?utm_source=feed#top' AS raw_url,
         CAST(doc_id * 2 + 1 AS BIGINT) AS ts_key
  FROM documents
)
SELECT {_canonicalize_sql("raw_url")} AS url,
       count(*) AS n_snapshots,
       max(ts_key) AS latest_ts_key,
       max_by(raw_url, ts_key) AS latest_raw_url,
       min(ts_key) AS first_ts_key
FROM snaps
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# line_dedup — remove lines that repeat across documents (boilerplate)
# ---------------------------------------------------------------------------

def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style duplicated-line removal: split each document into
    {LINE_WIDTH}-token lines, drop every line that occurs in more than
    one distinct document, reassemble the survivors in order.  A
    boilerplate line is prepended to every {BOILER_MOD}rd document so
    the oracle is non-trivial (it must always be removed).

    Scale: the duplicated-line set is built by ONE map-side-combinable
    aggregate keyed on md5(line) — the ubiquitous-boilerplate key is
    hot on the probe side but the aggregate's combiner flattens it.
    The dup set (only lines with >1 distinct doc) is small relative to
    the corpus and is **broadcast** back, so document text is never
    shuffled for the membership test; the single corpus-wide shuffle
    is the final per-doc reassembly, which any per-doc aggregation
    pays.  md5 (128-bit) keys the join, not h32 — at 10^12 lines a
    32-bit key would collide constantly.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).filter(F.size("tok") >= 1)
    boiler = F.array(*[F.lit(t) for t in BOILER_TOKENS])
    tok = tok.select(
        "doc_id",
        F.when(F.col("doc_id") % BOILER_MOD == 0, F.concat(boiler, F.col("tok")))
        .otherwise(F.col("tok"))
        .alias("tok"),
    )
    lines = tok.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tok"), F.lit(LINE_WIDTH)),
                lambda s: F.struct(
                    s.alias("pos"),
                    F.array_join(F.slice(F.col("tok"), s, LINE_WIDTH), " ").alias(
                        "line"
                    ),
                ),
            )
        ).alias("u"),
    ).select("doc_id", "u.pos", "u.line")
    dups = (
        lines.groupBy(F.md5("line").alias("line_md5"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("line_md5")
    )
    flagged = lines.join(
        F.broadcast(dups), F.md5(lines["line"]) == dups["line_md5"], "left"
    ).select("doc_id", "pos", "line", dups["line_md5"].isNotNull().alias("is_dup"))
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_dup"), F.struct("pos", "line")
                        )
                    )
                ),
                lambda x: x["line"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("is_dup").cast("int")).alias("n_removed"),
    )


LINE_DEDUP_SQL = f"""
WITH tok0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
  FROM documents
),
tok AS (
  SELECT doc_id,
         CASE WHEN doc_id % {BOILER_MOD} = 0
              THEN {list(BOILER_TOKENS)} || tok ELSE tok END AS tok
  FROM tok0 WHERE len(tok) >= 1
),
lines AS (
  SELECT doc_id, u.pos, u.line
  FROM (
    SELECT doc_id,
           unnest([{{'pos': s,
                     'line': array_to_string(tok[s : s + {LINE_WIDTH - 1}], ' ')}}
                   for s in generate_series(1, len(tok), {LINE_WIDTH})]) AS u
    FROM tok)
),
dups AS (
  SELECT md5(line) AS line_md5
  FROM lines GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
),
flagged AS (
  SELECT l.doc_id, l.pos, l.line, d.line_md5 IS NOT NULL AS is_dup
  FROM lines l LEFT JOIN dups d ON md5(l.line) = d.line_md5
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT is_dup THEN line END, ' ' ORDER BY pos), '')
         AS clean_text,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM flagged
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# stratified_sample — deterministic fixed quota per stratum
# ---------------------------------------------------------------------------

def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample: the {STRATUM_QUOTA} documents with
    the smallest (h32, doc_id) per lang — a deterministic, rerun- and
    engine-stable eval slice with equal representation per stratum.

    Scale: a naive window over each stratum sorts the whole corpus.
    Instead, phase 1 computes per-stratum counts (tiny aggregate,
    broadcast); phase 2 pre-filters each stratum to roughly
    quota x {PREFILTER_MARGIN} rows by a per-stratum hash threshold
    (narrow codegen over the scan), and only the survivors — O(quota)
    rows per stratum, not O(corpus) — pay the row_number sort.  The
    oracle mirrors the same threshold so both engines stay
    value-exact even in the (margin-bounded) case where the
    pre-filter leaves fewer than the quota.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    thresh = F.least(
        F.lit(PREFILTER_BUCKETS),
        F.ceil(
            F.lit(PREFILTER_MARGIN * STRATUM_QUOTA * PREFILTER_BUCKETS)
            / F.col("n_docs")
        ),
    ).alias("thresh")
    hv = h32(F.col("doc_id").cast("string"))
    from pyspark.sql import Window

    survivors = (
        docs.withColumn("hv", hv)
        .join(F.broadcast(counts.select("lang", thresh)), "lang")
        .filter(F.col("hv") % PREFILTER_BUCKETS < F.col("thresh"))
    )
    win = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= STRATUM_QUOTA)
        .select("lang", "doc_id", "n_chars", "sample_rank")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_docs,
         least({PREFILTER_BUCKETS},
               ceil({PREFILTER_MARGIN * STRATUM_QUOTA * PREFILTER_BUCKETS}
                    / n_docs)) AS thresh
  FROM documents GROUP BY lang
),
survivors AS (
  SELECT d.lang, d.doc_id, d.n_chars,
         {h32_sql("d.doc_id::VARCHAR")} AS hv
  FROM documents d JOIN counts c USING (lang)
  WHERE {h32_sql("d.doc_id::VARCHAR")} % {PREFILTER_BUCKETS} < c.thresh
)
SELECT lang, doc_id, n_chars,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS INT)
         AS sample_rank
FROM survivors
QUALIFY sample_rank <= {STRATUM_QUOTA}
"""


# ---------------------------------------------------------------------------
# host_diversity — mirror / boilerplate-farm domain detection
# ---------------------------------------------------------------------------

# every MIRROR_MODth page on a host serves the same templated content
MIRROR_MOD = 4


def host_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host content diversity: pages, distinct content hashes, and
    floor(distinct·100 / pages).  Hosts near 0 are mirror farms or
    parked templates — standard crawl-curation drop signals.  The
    derived crawl maps each document to host ``source.example.com``
    and collapses every {MIRROR_MOD}th page to one templated body.

    Scale: content is reduced to md5 IN THE SCAN (narrow codegen), so
    the only shuffle carries (host, md5) pairs.  count_distinct plans
    as two map-side-combinable aggregates — (host, md5) partial-dedup
    then host rollup — so a million-page host costs its distinct-hash
    count, not its page count, in shuffle bytes.  No text moves.
    """
    docs = load_table(spark, sf_dir, "documents")
    body = F.when(
        F.col("doc_id") % MIRROR_MOD == 0, F.lit("templated mirror body")
    ).otherwise(F.col("text"))
    crawl = docs.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.md5(body).alias("content_md5"),
    )
    return crawl.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.count_distinct("content_md5").alias("n_distinct"),
    ).select(
        "host",
        "n_pages",
        "n_distinct",
        F.floor(F.col("n_distinct") * 100 / F.col("n_pages")).alias(
            "diversity_x100"
        ),
    )


HOST_DIVERSITY_SQL = f"""
WITH crawl AS (
  SELECT source || '.example.com' AS host,
         md5(CASE WHEN doc_id % {MIRROR_MOD} = 0
                  THEN 'templated mirror body' ELSE text END) AS content_md5
  FROM documents
)
SELECT host,
       count(*) AS n_pages,
       CAST(count(DISTINCT content_md5) AS BIGINT) AS n_distinct,
       CAST(floor(count(DISTINCT content_md5) * 100.0 / count(*)) AS BIGINT)
         AS diversity_x100
FROM crawl
GROUP BY host
"""


# ---------------------------------------------------------------------------
# intradoc_dedup — within-document repetition (zero-shuffle)
# ---------------------------------------------------------------------------

PARA_WIDTH = 3  # tokens per synthetic "paragraph"


def intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-paragraph stats: split into
    {PARA_WIDTH}-token paragraphs, count total vs distinct, report
    floor(repeated·100 / total).  High repetition flags scraped
    listings / navigation spam — a per-document quality gate that
    needs NO corpus context.

    Scale: entirely narrow — paragraphs, distinct count, and the ratio
    are higher-order array functions over each row (zero Exchange, no
    Python).  At 100 TB this runs at scan speed fused into whatever
    stage reads the text.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    # guard the sequence bound: F.sequence(1, 0, 3) RAISES (unlike the
    # oracle's empty generate_series) — same empty-token guard as
    # ops.common.shingles
    idx = F.when(
        F.size(tok) >= 1, F.sequence(F.lit(1), F.size(tok), F.lit(PARA_WIDTH))
    ).otherwise(F.array().cast("array<int>"))
    paras = F.transform(
        idx,
        lambda s: F.array_join(F.slice(tok, s, PARA_WIDTH), " "),
    )
    return (
        docs.select("doc_id", paras.alias("paras"))
        .filter(F.size("paras") >= 1)
        .select(
            "doc_id",
            F.size("paras").cast("long").alias("n_para"),
            F.size(F.array_distinct("paras")).cast("long").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_para",
            "n_distinct",
            F.floor((F.col("n_para") - F.col("n_distinct")) * 100 / F.col("n_para"))
            .alias("rep_ratio_x100"),
        )
    )


INTRADOC_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql("text")} AS tok FROM documents
),
paras AS (
  SELECT doc_id,
         [array_to_string(tok[s : s + {PARA_WIDTH - 1}], ' ')
          for s in generate_series(1, len(tok), {PARA_WIDTH})] AS paras
  FROM toks
)
SELECT doc_id,
       CAST(len(paras) AS BIGINT) AS n_para,
       CAST(len(list_distinct(paras)) AS BIGINT) AS n_distinct,
       CAST(floor((len(paras) - len(list_distinct(paras))) * 100.0
                  / len(paras)) AS BIGINT) AS rep_ratio_x100
FROM paras
WHERE len(paras) >= 1
"""


# ---------------------------------------------------------------------------
# url_canonicalize — full structural URL normalization (pre-dedup step)
# ---------------------------------------------------------------------------

# query parameters that never change page identity (tracking only)
TRACKING_PARAM_RE = (
    "^(utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid)(=.*)?$"
)


def _url_canon_expr(col):
    """Structural canonical form of a URL, as pure codegen expressions:

    1. fragment stripped
    2. scheme lowercased; userinfo (``user:pw@``) dropped
    3. host lowercased, trailing root-dot stripped
    4. scheme-default port stripped (``:80`` http / ``:443`` https);
       non-default ports kept
    5. empty path becomes ``/`` (non-empty paths are NOT slash-trimmed
       — ``/a`` and ``/a/`` may be different resources; dot-segment
       resolution is deliberately out of scope, it needs a loop)
    6. query split on ``&``: empty params and tracking params
       (:data:`TRACKING_PARAM_RE`) dropped, surviving params keep
       their original order (sorting would merge ``?a=1&b=2`` with
       ``?b=2&a=1`` — an application choice, not a normalization)

    Total: anything without a ``scheme://host`` shape passes through
    unchanged.  Everything is regexp/array built-ins, so the operator
    is narrow, zero-shuffle, zero-Python — at 10^12 rows it is a pure
    map stage fused into whatever scan feeds it.
    """
    u = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        "^[^@]*@",
        "",
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, "^([^:]*)", 1)), r"\.$", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q2 = F.array_join(keep, "&")
    port2 = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        "",
    ).otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        port2,
        F.when(path == "", "/").otherwise(path),
        F.when(q2 == "", "").otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when((scheme == "") | (host == ""), col).otherwise(canon)


def _url_canon_sql(expr: str) -> str:
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (
        f"regexp_replace(regexp_extract({u},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '')"
    )
    host = (
        f"regexp_replace(lower(regexp_extract({hostport}, '^([^:]*)', 1)),"
        f" '\\.$', '')"
    )
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    path = (
        f"regexp_extract({u},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    )
    query = f"regexp_extract({u}, '\\?(.*)$', 1)"
    # coalesce: DuckDB array_to_string([]) is NULL, Spark array_join is ''
    q2 = (
        f"coalesce(array_to_string(list_filter(string_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p,"
        f" '{TRACKING_PARAM_RE}')), '&'), '')"
    )
    port2 = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443') THEN ''"
        f" ELSE ':' || {port} END"
    )
    canon = (
        f"{scheme} || '://' || {host} || {port2}"
        f" || CASE WHEN {path} = '' THEN '/' ELSE {path} END"
        f" || CASE WHEN {q2} = '' THEN '' ELSE '?' || {q2} END"
    )
    return (
        f"CASE WHEN {scheme} = '' OR {host} = '' THEN {expr}"
        f" ELSE {canon} END"
    )


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, raw_url, url_canon): structural canonicalization over a
    derived crawl table whose urls exercise every rule — mixed-case
    scheme/host, default and non-default ports, userinfo, trailing
    root-dot, empty paths, tracking and empty query params, and
    non-URL garbage (passthrough).

    Unlike :func:`url_dedup`'s 4-regexp collapse key, this is the
    rule-precise form a crawl frontier / revisit policy keys on.
    Scale: fully narrow — no shuffle at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    cls = F.col("doc_id") % 6
    messy = (
        F.when(cls == 0, F.concat(
            F.lit("https://WWW.Example.COM:443/p/"), d,
            F.lit("?x=1&utm_source=rss&y=2#frag")))
        .when(cls == 1, F.concat(
            F.lit("HTTP://user:pw@Example.com:80/p/"), d, F.lit("/")))
        .when(cls == 2, F.concat(
            F.lit("https://ex"), d, F.lit(".Example.com.")))
        .when(cls == 3, F.concat(
            F.lit("https://example.com:8080/p/"), d,
            F.lit("?utm_a=1&fbclid=zz")))
        .when(cls == 4, F.concat(
            F.lit("http://sub.example.com/p/"), d, F.lit("?a=2&&b=3")))
        .otherwise(F.concat(F.lit("not a url "), d))
    )
    return docs.select(
        "doc_id",
        messy.alias("raw_url"),
        _url_canon_expr(messy).alias("url_canon"),
    )


URL_CANONICALIZE_SQL = f"""
WITH crawl AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN 'https://WWW.Example.COM:443/p/' || doc_id::VARCHAR
                       || '?x=1&utm_source=rss&y=2#frag'
           WHEN 1 THEN 'HTTP://user:pw@Example.com:80/p/' || doc_id::VARCHAR
                       || '/'
           WHEN 2 THEN 'https://ex' || doc_id::VARCHAR || '.Example.com.'
           WHEN 3 THEN 'https://example.com:8080/p/' || doc_id::VARCHAR
                       || '?utm_a=1&fbclid=zz'
           WHEN 4 THEN 'http://sub.example.com/p/' || doc_id::VARCHAR
                       || '?a=2&&b=3'
           ELSE 'not a url ' || doc_id::VARCHAR
         END AS raw_url
  FROM documents
)
SELECT doc_id, raw_url, {_url_canon_sql("raw_url")} AS url_canon
FROM crawl
"""


QUERIES = {
    "url_dedup": (url_dedup, URL_DEDUP_SQL),
    "url_canonicalize": (url_canonicalize, URL_CANONICALIZE_SQL),
    "line_dedup": (line_dedup, LINE_DEDUP_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "host_diversity": (host_diversity, HOST_DIVERSITY_SQL),
    "intradoc_dedup": (intradoc_dedup, INTRADOC_DEDUP_SQL),
}
