"""Curation job: extracted pages → training-ready corpus, one DAG.

The glue the reference never had: after `jobs/extract.py` lands the
extracted table, this job runs the standard webtext curation funnel
over it —

  1. URL admission              (structural spam score over the url
                                 column — ops/urlquality semantics;
                                 scan-local, runs before everything)
  2. decode-error drop          (row-level errors never poison the mix)
  3. host-template strip        (each host's shared banner — the
                                 group-LCP of its documents — removed
                                 before dedup, where it distorts both
                                 exact and near-dup signals)
  4. quality floor              (token count + stopword/alpha ratios,
                                 pure codegen — ops/textstats semantics)
  5. exact dedup                (md5 groupBy, keep min url)
  6. near-dup collapse          (banded MinHash-LSH over h32 shingles,
                                 keep the band-bucket's BEST-quality
                                 member, ties to min url — FineWeb
                                 keep-best; bucketed, never all-pairs)
  7. repeated-span strip        (cross-document repeated >=8-token
                                 spans blanked from every carrier —
                                 ops/substring.py machinery; rows are
                                 transformed, never dropped)
  8. funnel lineage             (per-stage row counts + per-source
                                 composition, written next to the data)

and writes a training-ready parquet table bucketed-ready on url.

Every stage is a DataFrame transform on one DAG: Spark pipelines the
narrow stages into the scans, and the wide ops are the two dedup
shuffles (md5 keys; band keys) plus the host-grained template
aggregate (200-char prefixes only — bodies never shuffle).  The
funnel report makes the job
auditable at 100 TB: each stage's survivor count is one groupBy away,
computed on the SAME cached stage outputs that feed the next stage, so
audit and data cannot drift.

Run:  spark-submit --py-files dist/engine.zip jobs/curate.py \
          --input /path/extracted --output /path/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pdf_parser_spark.ops.common import tokens

MIN_TOKENS = 5          # quality floor: at least this many tokens
MIN_ALPHA_RATIO = 0.5   # alpha-bearing token fraction floor
# near-dup stage: shingle width / bands / rows come from ops.dedup


def url_admission(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Stage 1: drop structurally-spammy URLs (ID-farm paths, keyword
    chains, parameter farms — the oracle-verified
    ops/urlquality.py scorer applied to the REAL url column).  Pure
    scan-local codegen projection: Catalyst collapses it into the
    input scan, zero shuffle, which is why it runs before everything
    else — RefinedWeb-style URL filtering ahead of any content
    stage."""
    from pdf_parser_spark.ops.urlquality import spam_feature_cols

    return df.filter(spam_feature_cols(F.col(url_col))["admitted"])


def strip_host_templates(
    df: DataFrame, text_col: str = "text_extracted", url_col: str = "url"
) -> DataFrame:
    """Stage 3: remove each host's shared template banner — the
    longest common prefix of all the host's documents (the
    ops/template.py group-LCP machinery applied to real urls).  Rows
    are transformed, never dropped; ``_template_removed`` records the
    stripped char count per row.

    Running BEFORE dedup is load-bearing twice over: a host banner
    repeated verbatim across a site makes unrelated pages LOOK like
    near-dups (banner shingles dominate short docs), and two hosts
    mirroring the same body under different banners look UNLIKE
    exact dups.  Both distortions disappear once the per-host prefix
    is subtracted.

    Scale shape (PLANS.md §13): one host-grained min/max aggregate
    over {PREFIX_CAP}-char prefixes (bodies never shuffle), the tiny
    (host, template) table broadcast back, the strip itself a
    scan-local substring."""
    from pdf_parser_spark.ops.template import (
        MIN_DOCS,
        PREFIX_CAP,
        TEMPLATE_MIN_LEN,
        group_lcp,
    )

    host = F.regexp_extract(
        F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1
    )
    pre = df.select(
        host.alias("_h"),
        F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, PREFIX_CAP)
        .alias("_p"),
    )
    ext = pre.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_p").alias("_a"),
        F.max("_p").alias("_b"),
    )
    tmpl = (
        ext.withColumn("_tlen", group_lcp(F.col("_a"), F.col("_b")))
        .filter(
            (F.col("_n") >= MIN_DOCS)
            & (F.col("_tlen") >= TEMPLATE_MIN_LEN)
            # a FULL-cap LCP means the host's docs are identical as
            # far as we looked — that is a mirror (host_diversity's
            # signal, exact dedup's job), not a banner; the banner
            # evidence is a prefix that visibly ENDS inside the cap
            & (F.col("_tlen") < PREFIX_CAP)
        )
        .select(
            "_h",
            F.col("_a").substr(F.lit(1), F.col("_tlen").cast("int"))
            .alias("_tmpl"),
            "_tlen",
        )
    )
    joined = df.withColumn("_h", host).join(F.broadcast(tmpl), "_h", "left")
    has_tmpl = F.col("_tmpl").isNotNull() & F.col(text_col).startswith(
        F.col("_tmpl")
    )
    return (
        joined.withColumn(
            "_template_removed",
            F.when(has_tmpl, F.col("_tlen")).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            text_col,
            F.when(
                has_tmpl,
                F.col(text_col).substr(
                    (F.col("_tlen") + 1).cast("int"), F.length(text_col)
                ),
            ).otherwise(F.col(text_col)),
        )
        .drop("_h", "_tmpl", "_tlen")
    )


def quality_floor(df: DataFrame, text_col: str = "text_extracted") -> DataFrame:
    """Stage 4: drop rows under the token-count / alpha-ratio floor
    (pure codegen; same signal family as ops.textstats.quality)."""
    tok = tokens(F.col(text_col))
    n = F.size(tok)
    alpha = F.size(F.filter(tok, lambda t: t.rlike("[A-Za-z]")))
    return df.withColumn("_n_tok", n).filter(
        (F.col("_n_tok") >= MIN_TOKENS)
        & (alpha / F.col("_n_tok") >= MIN_ALPHA_RATIO)
    )


def exact_dedup(df: DataFrame, text_col: str = "text_extracted") -> DataFrame:
    """Stage 5: one md5 shuffle; the keeper is the min url per digest
    (deterministic, resume-stable)."""
    keyed = df.withColumn("_md5", F.md5(F.col(text_col).cast("binary")))
    keepers = keyed.groupBy("_md5").agg(F.min("url").alias("_keep_url"))
    return keyed.join(keepers, "_md5").filter(
        F.col("url") == F.col("_keep_url")
    ).drop("_md5", "_keep_url")


def neardup_collapse(df: DataFrame, text_col: str = "text_extracted") -> DataFrame:
    """Stage 6: banded MinHash-LSH collapse, keep the BEST-quality
    member per bucket (FineWeb-style keep-best; ties break to min
    url), i.e. the dedup_canonical policy applied at the job layer.

    Reuses the oracle-verified signature machinery from ops/dedup.py
    (Arrow numpy UDF — the interpreted-HOF spelling measured ~50x
    slower there) and the shared quality formula from ops/textstats
    (scan-local codegen, integer-scaled so the arg-max is exact).
    Scale shape (PLANS.md §5): only ``(url, q_int, band keys)`` ever
    shuffle — never text; a near-dup group shares at least one band
    bucket, and the keeper rule (a doc survives only if it wins its
    bucket in EVERY band) removes one side of every detected pair
    deterministically.  Docs too short to shingle pass through
    untouched.
    """
    from pdf_parser_spark.ops.common import tokens
    from pdf_parser_spark.ops.dedup import LSH_BANDS, LSH_ROWS, _make_sig_udf
    from pdf_parser_spark.ops.textstats import quality_features

    sig_udf = _make_sig_udf()
    tok = tokens(F.col(text_col))
    stop_ratio, diversity, length_sat = quality_features(tok)
    q_int = F.floor(
        (0.4 * stop_ratio + 0.3 * diversity + 0.3 * length_sat) * 10000.0
        + 0.5
    ).cast("long")
    # persist is load-bearing (CollapseProject would re-run the UDF
    # per band key and join side — measured ~10x in ops/dedup.py)
    sig = df.select(
        "url",
        (-q_int).alias("_nq"),
        sig_udf(F.col(text_col)).alias("_sig"),
    ).persist()
    try:
        banded = sig.filter(F.size("_sig") >= 1)
        band_cols = [
            F.concat_ws(
                ",",
                *[
                    F.col("_sig")[b * LSH_ROWS + r].cast("string")
                    for r in range(LSH_ROWS)
                ],
            ).alias(f"_band{b}")
            for b in range(LSH_BANDS)
        ]
        keyed = banded.select("url", "_nq", *band_cols)
        keep = None
        for b in range(LSH_BANDS):
            # arg-max quality (min of (-q, url)) is a partial-aggregable
            # min_by — map-side combine, same shape as the old min(url)
            kb = keyed.groupBy(f"_band{b}").agg(
                F.min_by("url", F.struct("_nq", "url")).alias("_ku")
            )
            ok = (
                keyed.select("url", f"_band{b}")
                .join(kb, f"_band{b}")
                .filter(F.col("url") == F.col("_ku"))
                .select("url")
            )
            keep = ok if keep is None else keep.intersect(ok)
        passthrough = sig.filter(F.size("_sig") < 1).select("url")
        # materialize the (urls-only, small) keep set while sig is
        # still cached — downstream consumers must never re-trigger
        # the signature UDF through the band joins
        keep = keep.unionByName(passthrough).persist()
        keep.count()
        return df.join(keep, "url")
    finally:
        sig.unpersist()


def strip_repeated_spans(
    df: DataFrame, text_col: str = "text_extracted", id_col: str = "url"
) -> DataFrame:
    """Stage 7: blank cross-document repeated spans (Lee et al.
    ACL'22 exact-substring dedup at the n-gram anchor —
    ops/substring.py documents the exactness argument) from EVERY
    carrier row.  Rows are transformed, never dropped; ``_n_tok`` is
    recomputed and ``_tok_removed`` records the per-row strip count
    for lineage.

    Scale shape (same as the oracled stats op): one Arrow gram pass,
    one combinable dup-gram aggregate, only (gram, id, pos) triples
    shuffle, islands window partitioned per document.  The rebuild
    drops covered token positions with an indexed array filter —
    per-row cost O(n_tok × n_islands), islands typically ≤ a few.
    """
    from pdf_parser_spark.ops.substring import (
        _make_gram_udf,
        dup_gram_hits,
        merge_islands,
    )

    udf = _make_gram_udf()
    grams = df.select(
        id_col, F.posexplode(udf(F.col(text_col))).alias("pos", "g")
    ).persist()
    try:
        islands = merge_islands(dup_gram_hits(grams, id_col), id_col)
        per_doc = islands.groupBy(id_col).agg(
            F.collect_list(F.struct("s", "e")).alias("_iv")
        )
        # the per-doc interval list is tiny (ids + a few int pairs,
        # only for documents that carry a repeated span); materialize
        # it while grams is cached so the rebuild join never
        # re-triggers the gram UDF.  It stays cached for the rest of
        # the job — bounded residency, and evicting it would recompute
        # the gram pass.
        per_doc = per_doc.persist()
        per_doc.count()
    finally:
        grams.unpersist()
    joined = df.join(per_doc, id_col, "left")
    tok = tokens(F.col(text_col))
    kept = F.filter(
        tok,
        lambda t, i: ~F.exists(
            "_iv", lambda iv: (i >= iv["s"]) & (i <= iv["e"])
        ),
    )
    kept = F.when(F.col("_iv").isNull(), tok).otherwise(kept)
    return (
        joined.withColumn("_kept", kept)
        .withColumn(
            "_tok_removed", (F.size(tok) - F.size("_kept")).cast("long")
        )
        .withColumn(text_col, F.array_join("_kept", " "))
        .withColumn("_n_tok", F.size("_kept"))
        .drop("_iv", "_kept")
    )


def curate(extracted: DataFrame) -> tuple[DataFrame, list[dict]]:
    """Run the funnel; returns (curated DF, per-stage lineage rows).

    Stage boundaries CHECKPOINT, not just cache: localCheckpoint
    materializes the stage (MEMORY_AND_DISK blocks, same residency as
    persist) AND truncates the logical plan.  Truncation is
    load-bearing — the self-joining stages each reference their input
    more than once (template strip ×2, exact dedup ×2, the band
    collapse ×8, span strip ×2), so an unbroken lineage compounds the
    PLAN multiplicatively: by the last stage the AQE plan *string*
    alone (explainString under onUpdatePlan) ran the driver heap out
    of memory — the plan, not the data, was the memory hog.  Earlier
    stages' blocks are released by the ContextCleaner as their frames
    go out of scope; a production run swaps in reliable checkpointing
    (spark.checkpoint.dir) at the same boundaries, which additionally
    survives executor loss.  The raw input is counted but never
    materialized (a plain scan both consumers re-read at parquet
    speed); the caller writes the curated frame immediately after
    this returns."""
    funnel: list[dict] = []

    def stage(name: str, frame: DataFrame, persist: bool = True) -> DataFrame:
        if persist:
            frame = frame.localCheckpoint(eager=True)
        funnel.append({"stage": name, "rows": frame.count()})
        return frame

    s0 = stage("input", extracted, persist=False)
    # URL admission runs FIRST: the cheapest filter in the funnel (a
    # scan-local projection over the url column, zero shuffle), so
    # structurally-spammy pages never reach the content stages.
    sA = stage("url_admitted", url_admission(s0))
    s1 = stage("decoded", sA.filter(F.col("decode_error").isNull()))
    s1b = stage("template_strip", strip_host_templates(s1))
    s2 = stage("quality", quality_floor(s1b))
    s3 = stage("exact_dedup", exact_dedup(s2))
    s4 = stage("near_dedup", neardup_collapse(s3))
    s5 = stage("span_dedup", strip_repeated_spans(s4))
    return s5, funnel


def with_host_rank(curated: DataFrame, ranks: DataFrame) -> DataFrame:
    """Attach each row's host authority (jobs/linkrank.py output) as
    ``host_rank_e9``; hosts absent from the rank table get 0.  A pure
    quality-prior column for downstream corpus mixing — never drops
    rows.  When the rank table carries ``harmonic_e6`` (linkrank
    ``--harmonic``), it passes through as ``host_harmonic_e6`` under
    the same absent-host-gets-0 rule.

    Scale: the rank table is O(hosts) — broadcast onto the curated
    frame; the host key derives from ``url`` in the scan projection.
    """
    has_harmonic = "harmonic_e6" in ranks.columns
    exprs = ["host AS _rh", "pagerank_e9 AS _rpr"]
    if has_harmonic:
        exprs.append("harmonic_e6 AS _rhc")
    rank_cols = ranks.selectExpr(*exprs)
    out = (
        curated.withColumn("_host", F.expr("parse_url(url, 'HOST')"))
        .join(F.broadcast(rank_cols), F.col("_host") == F.col("_rh"), "left")
        .withColumn(
            "host_rank_e9",
            F.coalesce(F.col("_rpr"), F.lit(0).cast("long")),
        )
    )
    if has_harmonic:
        out = out.withColumn(
            "host_harmonic_e6",
            F.coalesce(F.col("_rhc"), F.lit(0).cast("long")),
        )
    return out.drop("_host", "_rh", "_rpr", "_rhc")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="extracted table (parquet dir)")
    ap.add_argument("--output", required=True, help="curated output dir")
    ap.add_argument("--host-ranks", default=None,
                    help="host-rank table from jobs/linkrank.py; when set, "
                         "each curated row gains its host's authority as "
                         "host_rank_e9 (a quality prior for downstream "
                         "mixing — rows are never dropped by it)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pdf_parser_spark.spark.session import build_session

    spark = build_session("pdf-parser-spark-curate", master=args.master)
    extracted = spark.read.parquet(args.input)
    curated, funnel = curate(extracted)
    if args.host_ranks:
        curated = with_host_rank(curated, spark.read.parquet(args.host_ranks))
    # The parquet write is the ONLY action served by the stage-4 cache
    # (r2 ADVICE: a cache eviction between two dependent actions would
    # recompute the whole funnel, LSH joins included).  The token count
    # ships in the output as `n_tokens` — a useful lineage column — so
    # the composition aggregate reads the WRITTEN table back instead of
    # re-traversing the funnel.
    curated.withColumnRenamed("_n_tok", "n_tokens").withColumnRenamed(
        "_tok_removed", "span_tokens_removed"
    ).write.mode("overwrite").parquet(f"{args.output}/data")
    curated.unpersist()
    comp = [
        r.asDict()
        for r in spark.read.parquet(f"{args.output}/data")
        .groupBy("doc_type")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("span_tokens_removed").alias("span_tokens_removed"),
        )
        .collect()
    ]
    report = {"funnel": funnel, "composition": comp}
    with open(f"{args.output}/funnel.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
