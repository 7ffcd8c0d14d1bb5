"""Recrawl operators: crawl-over-crawl deltas and inbound anchor-text
aggregation.

A continuously-crawled corpus is maintained, not rebuilt: each new
crawl batch is diffed against the previous one (what appeared,
vanished, changed, stayed identical per URL — that drives refresh
scheduling and incremental downstream recompute), and pages are
enriched with the anchor text of their inbound links (a classic
web-corpus quality/description signal; the reference engine has no
corpus layer at all, reference scope per SURVEY.md §2.10+).

Both link/url universes are derived deterministically from
``documents`` — the same convention as ops/linkgraph.py and
ops/webcorpus.py (the driver's sf tables carry no urls).

Scale design:

* crawl_delta moves only (url_key, doc_id, text_md5) triples — the
  md5 is computed in the scan, text never shuffles.  Two partial
  (map-side-combining) min_by aggregates, one url-keyed full-outer
  hash join.  At 100 TB this is the canonical recrawl diff: both
  sides partition on the url hash, AQE picks shuffle-hash, and
  skewed URL popularity is impossible by construction (one
  representative per url per batch BEFORE the join).
* anchor_text_stats moves only (src, dst, anchor) int/short-string
  triples; all aggregates are host-grained (counts + one distinct),
  so every groupBy collapses to O(hosts) rows with map-side partial
  aggregation, and the final top-anchor window runs over O(hosts ×
  vocab) rows — WindowGroupLimit territory, never document-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdf_parser_spark.ops.common import (
    h32,
    h32_sql,
    load_table,
    seeded_h32,
    seeded_h32_sql,
)

# crawl_delta: even doc_ids form the previous crawl, odd the new one.
# The modulus is ODD so the same url_key is hit by docs of both
# parities (doc_id k and k+301 differ in parity) — with an even
# modulus every url would fall wholly inside one batch.  Every
# STABLE_MOD-th url is a "stable page": its content signature is
# crawl-invariant, so the ``unchanged`` arm is exercised even though
# the synthetic documents' texts are all distinct.
URL_KEY_MOD = 301
STABLE_MOD = 5

# anchor_text_stats: same graph shape as ops/linkgraph.py
N_HOSTS = 60
K_OUT = 3
ANCHOR_VOCAB = (
    "click here", "read more", "homepage", "details",
    "reference", "source", "link", "article",
)


# ---------------------------------------------------------------------------
# crawl_delta — per-url diff of two crawl batches
# ---------------------------------------------------------------------------

def crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff the new crawl batch (odd doc_ids) against the previous one
    (even doc_ids) per url: ``added`` (new only), ``removed`` (old
    only), ``changed`` (both, different content hash), ``unchanged``.
    One row per url with the representative doc ids on each side
    (lowest doc_id; -1 when absent, keeping the output int-typed for
    the driver's value-hash gate).
    """
    url_key = F.col("doc_id") % URL_KEY_MOD
    sig = F.when(
        url_key % STABLE_MOD == 0,
        F.md5(F.concat(F.lit("stable-"), url_key.cast("string"))),
    ).otherwise(F.md5("text"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", url_key.alias("url_key"), sig.alias("sig")
    )

    def batch(parity: int):
        return (
            docs.filter(F.col("doc_id") % 2 == parity)
            .groupBy("url_key")
            .agg(
                F.min("doc_id").alias("rep"),
                F.min_by("sig", "doc_id").alias("sig"),
            )
        )

    old = batch(0).select(
        "url_key", F.col("rep").alias("old_doc"), F.col("sig").alias("old_sig")
    )
    new = batch(1).select(
        "url_key", F.col("rep").alias("new_doc"), F.col("sig").alias("new_sig")
    )
    joined = old.join(new, "url_key", "full_outer")
    status = (
        F.when(F.col("old_doc").isNull(), F.lit("added"))
        .when(F.col("new_doc").isNull(), F.lit("removed"))
        .when(F.col("old_sig") == F.col("new_sig"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        "url_key",
        status.alias("status"),
        F.coalesce("old_doc", F.lit(-1)).alias("old_doc"),
        F.coalesce("new_doc", F.lit(-1)).alias("new_doc"),
    )


CRAWL_DELTA_SQL = f"""
WITH sigs AS (
  SELECT doc_id, doc_id % {URL_KEY_MOD} AS url_key,
         CASE WHEN (doc_id % {URL_KEY_MOD}) % {STABLE_MOD} = 0
              THEN md5('stable-' || (doc_id % {URL_KEY_MOD})::VARCHAR)
              ELSE md5(text) END AS sig
  FROM documents
),
old AS (
  SELECT url_key, min(doc_id) AS old_doc, arg_min(sig, doc_id) AS old_sig
  FROM sigs WHERE doc_id % 2 = 0 GROUP BY url_key
),
new AS (
  SELECT url_key, min(doc_id) AS new_doc, arg_min(sig, doc_id) AS new_sig
  FROM sigs WHERE doc_id % 2 = 1 GROUP BY url_key
)
SELECT coalesce(o.url_key, n.url_key) AS url_key,
       CASE WHEN o.old_doc IS NULL THEN 'added'
            WHEN n.new_doc IS NULL THEN 'removed'
            WHEN o.old_sig = n.new_sig THEN 'unchanged'
            ELSE 'changed' END AS status,
       coalesce(o.old_doc, -1) AS old_doc,
       coalesce(n.new_doc, -1) AS new_doc
FROM old o FULL OUTER JOIN new n ON o.url_key = n.url_key
"""


# ---------------------------------------------------------------------------
# anchor_text_stats — inbound anchor aggregation per target host
# ---------------------------------------------------------------------------

def anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per target host: inbound link count, distinct linking hosts,
    and the most common inbound anchor text (count-desc, anchor-asc
    tie-break so the pick is engine-deterministic).  Links follow the
    ops/linkgraph.py synthesis (host = h32(doc_id) % {N_HOSTS},
    {K_OUT} outlinks per doc, self-loops dropped — parallel links KEPT
    here: each carries its own anchor); the anchor is drawn from a
    fixed vocabulary by link hash, standing in for the linking page's
    anchor markup.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("d")
    )
    vocab = F.array(*[F.lit(a) for a in ANCHOR_VOCAB])
    links = (
        docs.select(
            (h32(F.col("d")) % N_HOSTS).alias("src"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (seeded_h32(k, F.col("d")) % N_HOSTS).alias("dst"),
                            F.element_at(
                                vocab,
                                (
                                    seeded_h32(100 + k, F.col("d"))
                                    % len(ANCHOR_VOCAB)
                                    + 1
                                ).cast("int"),
                            ).alias("anchor"),
                        )
                        for k in range(1, K_OUT + 1)
                    ]
                )
            ).alias("l"),
        )
        .select("src", "l.dst", "l.anchor")
        .filter(F.col("src") != F.col("dst"))
    )
    host_stats = links.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src").alias("n_src_hosts"),
    )
    anchor_counts = links.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    top = (
        anchor_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dst",
            F.col("anchor").alias("top_anchor"),
            F.col("cnt").alias("top_anchor_count"),
        )
    )
    return host_stats.join(top, "dst").select(
        F.col("dst").alias("host"),
        "n_links",
        "n_src_hosts",
        "top_anchor",
        "top_anchor_count",
    )


_ANCHOR_CASES = " ".join(
    f"WHEN {i} THEN '{a}'" for i, a in enumerate(ANCHOR_VOCAB)
)

ANCHOR_TEXT_STATS_SQL = f"""
WITH docs AS (
  SELECT doc_id::VARCHAR AS d FROM documents
),
links AS (
  SELECT {h32_sql('d')} % {N_HOSTS} AS src,
         {seeded_h32_sql('g.k', 'd')} % {N_HOSTS} AS dst,
         CASE {seeded_h32_sql('(100 + g.k)', 'd')} % {len(ANCHOR_VOCAB)}
              {_ANCHOR_CASES} END AS anchor
  FROM docs, generate_series(1, {K_OUT}) AS g(k)
),
clean AS (SELECT * FROM links WHERE src <> dst),
host_stats AS (
  SELECT dst, count(*) AS n_links, count(DISTINCT src) AS n_src_hosts
  FROM clean GROUP BY dst
),
anchor_counts AS (
  SELECT dst, anchor, count(*) AS cnt FROM clean GROUP BY dst, anchor
),
top AS (
  SELECT dst, anchor AS top_anchor, cnt AS top_anchor_count
  FROM (
    SELECT *, row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, anchor ASC) AS rn
    FROM anchor_counts
  ) WHERE rn = 1
)
SELECT h.dst AS host, h.n_links, h.n_src_hosts, t.top_anchor, t.top_anchor_count
FROM host_stats h JOIN top t ON h.dst = t.dst
"""


QUERIES = {
    "crawl_delta": (crawl_delta, CRAWL_DELTA_SQL),
    "anchor_text_stats": (anchor_text_stats, ANCHOR_TEXT_STATS_SQL),
}
