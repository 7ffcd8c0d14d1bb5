"""Re-run the physical-plan audit documented in PLANS.md.

Asserts the load-bearing plan properties: column pruning through the
extraction UDF, single ArrowEvalPython node, broadcast resume
anti-join, predicate pushdown, broadcast query side in top-k.

Usage: python scripts/audit_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from pdf_parser_spark.spark.job import resume_filter
    from pdf_parser_spark.spark.session import build_session
    from pdf_parser_spark.spark.udfs import with_extraction

    spark = build_session("plan-audit", master="local[4]", shuffle_partitions=8)
    checks = []

    pages_src = entrymod._pages_df(spark, scale=1)
    tmp = "/tmp/pdf_parser_spark_audit_pages.parquet"
    pages_src.write.mode("overwrite").parquet(tmp)
    pages = spark.read.parquet(tmp)

    # 1. column pruning through the UDF
    p = plan_of(with_extraction(pages).select("url", "text_extracted"))
    checks.append(("prune-to-url-html", "ReadSchema: struct<url:string,html:binary>" in p))
    checks.append(("single-arrow-eval", p.count("ArrowEvalPython") == 1))
    checks.append(("no-exchange-in-narrow-extract", "Exchange" not in p))

    # 2. resume anti-join broadcasts a small committed side
    p = plan_of(resume_filter(pages, pages.limit(10).select("url")))
    checks.append(("broadcast-left-anti", "LeftAnti" in p and "Broadcast" in p))

    # 3. predicate pushdown to the scan
    p = plan_of(pages.filter(F.col("warc_ts") > F.lit("2025-01-01 00:00:05").cast("timestamp")).select("url"))
    checks.append(("pushdown-warc-ts", "warc_ts" in p.split("DataFilters")[-1][:200]
                   if "DataFilters" in p else False))

    # 4. top-k broadcasts the query side
    from pdf_parser_spark.ops.similarity import ann_cosine_topk

    p = plan_of(ann_cosine_topk(spark, "/root/testdata/sf0.001"))
    checks.append(("topk-broadcast-queries", "BroadcastNestedLoopJoin" in p))

    # 4b. contamination check broadcasts the benchmark side (the
    # corpus side must never shuffle its grams to a benchmark join)
    from pdf_parser_spark.ops.curation import contamination_ngram, pii_redact

    p = plan_of(contamination_ngram(spark, "/root/testdata/sf0.001"))
    checks.append(("contamination-broadcast-bench", "BroadcastHashJoin" in p))

    # 4c. PII redaction stays a narrow codegen scan — no exchange,
    # no Python
    p = plan_of(pii_redact(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("pii-redact-narrow-codegen",
         "Exchange" not in p and "ArrowEvalPython" not in p)
    )

    # 4d. contamination never materializes a corpus-wide gram table
    p2 = plan_of(contamination_ngram(spark, "/root/testdata/sf0.001"))
    checks.append(("contamination-no-corpus-cache", "InMemoryRelation" not in p2))

    # 4e. the skew-hardened jaccard self-join shuffles on the COMPOSITE
    # (mh0, band-emission) key, not mh0 alone
    from pdf_parser_spark.ops.dedup import dedup_ngram_jaccard

    p = plan_of(dedup_ngram_jaccard(spark, "/root/testdata/sf0.001"))
    join_seg = p.split("Join")[1][:400] if "Join" in p else ""
    checks.append(
        ("jaccard-composite-join-key", "mh0" in join_seg and "k#" in join_seg)
    )

    # 4f. corpus_select broadcasts the benchmark gram side
    from pdf_parser_spark.ops.curation import corpus_select

    p = plan_of(corpus_select(spark, "/root/testdata/sf0.001"))
    checks.append(("corpus-select-broadcast-bench", "BroadcastHashJoin" in p))

    # 4g. admission-control ops (ops/filtering.py)
    from pdf_parser_spark.ops.filtering import (
        doclen_percentiles,
        incremental_dedup,
        quality_classifier,
        url_host_filter,
    )

    # blocklist suffix semantics rewritten as TWO broadcast equi-joins
    # (PSL candidate-suffix rules, then the blocklist) — never a
    # per-rule LIKE scan / nested loop, never a shuffled join
    p = plan_of(url_host_filter(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("hostfilter-psl-broadcast-equijoins",
         p.count("BroadcastHashJoin") >= 2
         and "NestedLoop" not in p and "SortMergeJoin" not in p)
    )

    # both join sides reduced to (md5, id) before any join; joins are
    # broadcast at this scale (AQE would pick sides at 100 TB)
    p = plan_of(incremental_dedup(spark, "/root/testdata/sf0.001"))
    checks.append(("incdedup-broadcast", "BroadcastHashJoin" in p))

    # pure-codegen linear gate: no exchange, no Python
    p = plan_of(quality_classifier(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("quality-gate-narrow-codegen",
         "Exchange" not in p and "ArrowEvalPython" not in p)
    )

    # percentiles: the corpus-sized operation is ONE combinable
    # aggregate (partial_count before its exchange); the window sorts
    # only the distinct-value rows, and no Python anywhere
    p = plan_of(doclen_percentiles(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("percentiles-partial-agg-then-window",
         "partial_count" in p and "Window" in p
         and "ArrowEvalPython" not in p)
    )

    # 4h. containment prefix-filter join: every join is a hash join
    # on an equi-key (shingle / doc id) — no cartesian or nested-loop
    # shape anywhere, and the document-frequency aggregate combines
    # map-side before its exchange
    from pdf_parser_spark.ops.containment import dedup_containment

    p = plan_of(dedup_containment(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("containment-hash-joins-only",
         "CartesianProduct" not in p and "NestedLoop" not in p)
    )
    checks.append(("containment-df-partial-agg", "partial_count" in p))

    # 4i. intradoc_dedup is fully narrow: no exchange, no Python
    from pdf_parser_spark.ops.webcorpus import host_diversity, intradoc_dedup

    p = plan_of(intradoc_dedup(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("intradoc-narrow-codegen",
         "Exchange" not in p and "ArrowEvalPython" not in p)
    )

    # 4j. host_diversity shuffles only (host, md5) — text reduced to a
    # hash in the scan, no Python
    p = plan_of(host_diversity(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("hostdiversity-no-python", "ArrowEvalPython" not in p)
    )

    # 4k. LSH top-k probes via a broadcast equi-join on the bucket
    from pdf_parser_spark.ops.similarity import ann_lsh_topk

    p = plan_of(ann_lsh_topk(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("lsh-topk-broadcast-bucket-join",
         "BroadcastHashJoin" in p and "NestedLoop" not in p)
    )

    # 4l. substring_dedup: every ArrowEvalPython occurrence sits inside
    # the persisted gram relation (the hasher physically runs once per
    # materialization — plan toString repeats the cached plan under
    # each InMemoryTableScan), and all joins are hash joins
    from pdf_parser_spark.ops.substring import substring_dedup

    p = plan_of(substring_dedup(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("substring-cached-arrow-hash-joins",
         p.count("ArrowEvalPython") == p.count("InMemoryRelation")
         and p.count("InMemoryRelation") >= 1
         and "CartesianProduct" not in p and "NestedLoop" not in p)
    )

    # 4m. dsir_select: the 256-row weight table is broadcast back onto
    # the token stream (never a shuffled join), and the score plan has
    # no Python — the whole feature/weight path is codegen
    from pdf_parser_spark.ops.selection import dsir_select

    p = plan_of(dsir_select(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("dsir-broadcast-weights",
         "BroadcastHashJoin" in p and "ArrowEvalPython" not in p
         and "CartesianProduct" not in p and "NestedLoop" not in p)
    )

    # 4n. dedup_edit_verify: the tail projection happens before the
    # pair joins — no full `text` column may appear on the shuffle
    # side of the verify joins (tails are derived in the scan-side
    # Project), and levenshtein stays JVM-side
    from pdf_parser_spark.ops.editverify import dedup_edit_verify

    p = plan_of(dedup_edit_verify(spark, "/root/testdata/sf0.001"))
    verify_stage = p.split("levenshtein")[0]
    checks.append(
        ("editverify-tails-projected-before-join",
         "levenshtein" in p and "substr" in p
         and "CartesianProduct" not in verify_stage)
    )
    # the O(TAIL_W^2) edit distance must run ONCE per pair (measured
    # 7.1 s -> 1.6 s when the duplicated spelling was split into two
    # Projects; CollapseProject must not re-inline it)
    checks.append(("editverify-single-levenshtein",
                   p.count("levenshtein") == 1))

    # 4o. crawl_priority: host-grained inputs only — the per-host agg
    # partial-combines before its exchange and no Python anywhere
    from pdf_parser_spark.ops.linkgraph import crawl_priority

    p = plan_of(crawl_priority(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("crawlpriority-partial-agg-no-python",
         "partial_count" in p and "ArrowEvalPython" not in p)
    )

    # 4p. bloom_incremental_dedup: the filter build shuffles only
    # O(m/32) word rows (bit_or partial-combines map-side) and the
    # probe joins the BROADCAST word table — the corpus never shuffles
    # to the probe, and nothing runs in Python
    from pdf_parser_spark.ops.bloom import bloom_incremental_dedup

    p = plan_of(bloom_incremental_dedup(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("bloom-broadcast-words-partial-bitor",
         "BroadcastHashJoin" in p and "partial_bit_or" in p
         and "ArrowEvalPython" not in p and "NestedLoop" not in p)
    )

    # 4q. split_decontaminated: the leak check is a LEFT SEMI join on
    # band keys (never a pair-exploding inner join), and the text
    # column stays inside the signature stage — nothing downstream of
    # the band exchange carries text
    from pdf_parser_spark.ops.splits import (
        lang_temperature_sample,
        split_decontaminated,
    )

    p = plan_of(split_decontaminated(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("split-leftsemi-band-keys",
         "LeftSemi" in p
         and "text" not in p.split("LeftSemi")[0].split("Exchange")[-1])
    )

    # 4r. lang_temperature_sample: the quota table joins BROADCAST and
    # the doc stream is never sorted or windowed (the hash gate is the
    # whole point — no per-lang rank window)
    p = plan_of(lang_temperature_sample(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("lts-broadcast-quota-no-window",
         "BroadcastHashJoin" in p and "Window" not in p
         and "ArrowEvalPython" not in p)
    )

    # 4s. heavy_hitters_cms: the sketch grid partial-combines map-side
    # before its exchange and the probe side joins broadcast
    from pdf_parser_spark.ops.sketches import heavy_hitters_cms

    p = plan_of(heavy_hitters_cms(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("cms-partial-agg-broadcast-probe",
         "partial_count" in p and "BroadcastHashJoin" in p
         and "ArrowEvalPython" not in p)
    )

    # 4t. crawl_schedule: exactly ONE exchange (the per-host window's
    # hash partitioning) — politeness serializes hosts anyway
    from pdf_parser_spark.ops.linkgraph import crawl_schedule

    p = plan_of(crawl_schedule(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("crawlschedule-single-exchange",
         p.count("Exchange hashpartitioning") == 1
         and "ArrowEvalPython" not in p)
    )

    # 4u. robots_filter: the rules side is BROADCAST with the prefix
    # test as a residual; the corpus sees one exchange (the verdict
    # aggregate), never a sort-merge join
    from pdf_parser_spark.ops.filtering import robots_filter

    p = plan_of(robots_filter(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("robots-broadcast-rules",
         "BroadcastHashJoin" in p and "SortMergeJoin" not in p
         and "ArrowEvalPython" not in p
         and p.count("Exchange hashpartitioning") == 1)
    )

    # 4v. gopher/c4 heuristics: pure per-document array HOFs — zero
    # exchange, zero Python
    from pdf_parser_spark.ops.heuristics import (
        c4_line_filter,
        gopher_quality_filter,
    )

    for nm, fn in (("gopher-narrow-codegen", gopher_quality_filter),
                   ("c4-narrow-codegen", c4_line_filter)):
        p = plan_of(fn(spark, "/root/testdata/sf0.001"))
        checks.append(
            (nm, "Exchange" not in p and "ArrowEvalPython" not in p
             and "BatchEvalPython" not in p)
        )

    # 4w. url_canonicalize: pure regexp/array codegen — narrow map
    # stage, zero exchange, zero Python
    from pdf_parser_spark.ops.webcorpus import url_canonicalize

    p = plan_of(url_canonicalize(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("urlcanon-narrow-codegen",
         "Exchange" not in p and "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p)
    )

    # 4x. corpus_shuffle: ONE exchange (hash on shard) + shard-local
    # sort — never a corpus-global range sort (orderBy(rand()) shape)
    from pdf_parser_spark.ops.assembly import corpus_shuffle

    p = plan_of(corpus_shuffle(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("shuffle-shard-local-sort",
         p.count("Exchange") == 1 and "hashpartitioning(shard" in p
         and "rangepartitioning" not in p)
    )

    # 4y. crawl_delta: one full-outer hash/merge join over per-url
    # aggregates; partial aggregation below the exchange (only one
    # (url_key, rep, sig) row per url per batch is shuffled)
    from pdf_parser_spark.ops.recrawl import anchor_text_stats, crawl_delta

    p = plan_of(crawl_delta(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("crawldelta-partial-agg-narrow-join",
         "partial_min" in p and "ArrowEvalPython" not in p
         and "CartesianProduct" not in p and "NestedLoop" not in p)
    )

    # 4z. anchor_text_stats: host-grained aggregates with map-side
    # partials, window top-1 over O(hosts x vocab), no Python
    p = plan_of(anchor_text_stats(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("anchorstats-host-grained",
         "partial_count" in p and "ArrowEvalPython" not in p
         and "CartesianProduct" not in p and "NestedLoop" not in p)
    )

    # 4aa. ccnet_lm_filter: the bucket table broadcasts back onto the
    # token stream (never a shuffled join of the corpus-sized side);
    # one small shuffled join remains legitimate: per-doc aggregates
    # against the 1-row percentile-cut relation
    from pdf_parser_spark.ops.heuristics import ccnet_lm_filter

    p = plan_of(ccnet_lm_filter(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("ccnet-broadcast-buckets",
         "BroadcastHashJoin" in p and "ArrowEvalPython" not in p
         and "CartesianProduct" not in p)
    )

    # 4ab. dedup_semantic: the SemDeDup pair join is CLUSTER-BUCKETED —
    # an equi-join keyed on cluster_id (hash/SMJ), never a cartesian /
    # nested-loop all-pairs; assignment stays a narrow Arrow map
    from pdf_parser_spark.ops.semantic import dedup_semantic

    p = plan_of(dedup_semantic(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("semantic-pair-join-cluster-bucketed",
         any("cluster_id" in seg[:300] for seg in p.split("Join")[1:])
         and "CartesianProduct" not in p and "NestedLoop" not in p)
    )

    # 4ac. incremental_minhash_dedup: the batch-vs-index candidate join
    # is an equi-join on (band, band_key) — never cartesian/nested-loop
    # — and document text never crosses a shuffle (only ids, 16-long
    # signatures, and 32-byte band keys; the one Arrow eval is the
    # signature UDF feeding the persisted relation)
    from pdf_parser_spark.ops.incnear import incremental_minhash_dedup

    p = plan_of(incremental_minhash_dedup(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("incnear-band-equijoin-no-text-shuffle",
         any("band_key" in seg[:300] for seg in p.split("Join")[1:])
         and "CartesianProduct" not in p and "NestedLoop" not in p
         and all("text" not in seg[:400]
                 for seg in p.split("Exchange hashpartitioning")[1:]))
    )

    # 4ad. token_drift: the explosion collapses in a map-side partial
    # sum before its exchange (shuffle volume O(vocab x partitions),
    # never O(token instances)); the 1-row totals frame joins by
    # broadcast; the top-K is a TakeOrdered, not a global sort; no
    # Python anywhere
    from pdf_parser_spark.ops.drift import token_drift

    p = plan_of(token_drift(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("tokendrift-partial-agg-broadcast-totals",
         "partial_sum" in p and "Broadcast" in p
         and "TakeOrderedAndProject" in p
         and "ArrowEvalPython" not in p)
    )

    # 4ae. sketch_overlap: the two K-sketches collapse into ONE
    # persisted per-(lang, h) flags relation — every downstream branch
    # reads InMemoryTableScan, so the corpus is scanned once; the
    # theta frame joins by broadcast; no cartesian, no Python, and
    # nothing text-sized crosses a shuffle (only lang/side/h rows)
    from pdf_parser_spark.ops.overlap import sketch_overlap

    df = sketch_overlap(spark, "/root/testdata/sf0.001")
    p = plan_of(df)
    checks.append(
        ("sketchoverlap-single-scan-broadcast-theta",
         "InMemoryTableScan" in p and "Broadcast" in p
         and "CartesianProduct" not in p and "NestedLoop" not in p
         and "ArrowEvalPython" not in p
         and all("text" not in seg[:400]
                 for seg in p.split("Exchange hashpartitioning")[1:]))
    )
    spark.catalog.clearCache()

    # 4af. url_blocklist_filter: the category list joins by BROADCAST
    # and the op is row-per-input — zero hash-partition exchanges at
    # any corpus size; keyword scoring is scan-local JVM contains (no
    # Python)
    from pdf_parser_spark.ops.blocklist import url_blocklist_filter

    p = plan_of(url_blocklist_filter(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("blocklist-broadcast-no-shuffle",
         "BroadcastHashJoin" in p
         and "Exchange hashpartitioning" not in p
         and "ArrowEvalPython" not in p)
    )

    # 4ag. host_centrality_hyperball: every radius step reads the
    # PERSISTED register/edge relations (InMemoryTableScan — the
    # corpus parquet is scanned once, not once per radius), merges are
    # partial-aggregated groupBy-max, and nothing but (node, bucket,
    # rho) triples crosses a shuffle; no cartesian anywhere — the only
    # intentional cross join is nodes x the 16-row bucket frame
    from pdf_parser_spark.ops.centrality import host_centrality_hyperball

    df = host_centrality_hyperball(spark, "/root/testdata/sf0.001")
    p = plan_of(df)
    # (InMemoryRelation reprints its cached child plan under every
    # InMemoryTableScan, so "Scan parquet" still appears textually —
    # the load-bearing property is that every register/edge reference
    # reads a cache: >= T+1 merge reads + T+1 estimate reads)
    checks.append(
        ("hyperball-register-reuse-partial-max",
         p.count("InMemoryTableScan") >= 8
         and "partial_max" in p
         and "ArrowEvalPython" not in p
         and all("text" not in seg[:400]
                 for seg in p.split("Exchange hashpartitioning")[1:]))
    )
    spark.catalog.clearCache()

    # 4ah. dedup_canonical: the per-cluster winner is a struct-max
    # AGGREGATE (map-side combinable partial_max below the exchange),
    # never a sort+Window over every (doc, cluster) row; the selection
    # stage adds NO Python of its own (the only Arrow UDF in the plan
    # is the upstream pair generator's shingle_hashes, reprinted under
    # the cached cluster relation) and no row-at-a-time Python exists
    # anywhere; no cartesian
    from pdf_parser_spark.ops.canonical import dedup_canonical

    p = plan_of(dedup_canonical(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("canonical-argmax-partial-agg-no-window",
         "partial_max" in p
         and "Window" not in p
         and "CartesianProduct" not in p
         and "BatchEvalPython" not in p
         and all("shingle_hashes" in seg[:200]
                 for seg in p.split("ArrowEvalPython ")[1:]))
    )
    spark.catalog.clearCache()

    # 4ai. filter_overlap_matrix: all pairwise joint counts live in ONE
    # partial-aggregated conditional-sum reduce (no filter-to-filter
    # join, no cartesian); the only non-equi join in the whole plan is
    # ccnet's sanctioned 1-row percentile cross
    from pdf_parser_spark.ops.ablation import filter_overlap_matrix

    p = plan_of(filter_overlap_matrix(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("ablation-single-partial-agg-reduce",
         "partial_sum" in p
         and "CartesianProduct" not in p
         and p.count("BroadcastNestedLoopJoin") <= 1)
    )
    spark.catalog.clearCache()

    # 4aj. url_spam_score and text_script_detect are pure scan-local
    # projections: zero exchanges, zero Python, at any corpus size
    from pdf_parser_spark.ops.scriptmix import text_script_detect
    from pdf_parser_spark.ops.urlquality import url_spam_score

    p = plan_of(url_spam_score(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("urlquality-scan-local",
         "Exchange" not in p and "Python" not in p)
    )
    p = plan_of(text_script_detect(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("scriptmix-scan-local",
         "Exchange" not in p and "Python" not in p)
    )

    # 4ak. host_template_prefix: the single exchange carries the
    # capped prefix, never the text column (projected before the
    # partial min/max aggregate — document bodies must not shuffle)
    from pdf_parser_spark.ops.template import host_template_prefix

    p = plan_of(host_template_prefix(spark, "/root/testdata/sf0.001"))
    ex_seg = p.split("Exchange hashpartitioning")[-1][:400] if (
        "Exchange hashpartitioning" in p) else ""
    checks.append(
        ("template-prefix-narrow",
         p.count("Exchange") == 1
         and "partial_min" in p
         and "text#" not in ex_seg)
    )

    # 4al. bm25_retrieval: the query vocabulary, df, and stats frames
    # are broadcast; the only hash exchanges carry integer posting
    # rows, never document text; no cartesian beyond the sanctioned
    # 1-row stats cross
    from pdf_parser_spark.ops.bm25 import bm25_retrieval

    p = plan_of(bm25_retrieval(spark, "/root/testdata/sf0.001"))
    ex_segs = [seg[:300] for seg in p.split("Exchange hashpartitioning")[1:]]
    checks.append(
        ("bm25-broadcast-query-side",
         "BroadcastHashJoin" in p
         and "CartesianProduct" not in p
         and p.count("BroadcastNestedLoopJoin") <= 1
         and all("text#" not in seg for seg in ex_segs))
    )

    # 4am. pmi_top_pairs: support filter applied to the AGGREGATED
    # pair relation (partial counts below the exchange), top-k as
    # TakeOrderedAndProject — no global sort, no cartesian beyond the
    # 1-row totals cross
    from pdf_parser_spark.ops.pmi import pmi_top_pairs

    p = plan_of(pmi_top_pairs(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("pmi-support-bounded-joins",
         "partial_count" in p
         and "TakeOrderedAndProject" in p
         and "CartesianProduct" not in p
         and p.count("BroadcastNestedLoopJoin") <= 1)
    )

    # 4an. robots_txt_eval: the parsed rules relation is broadcast to
    # the fetch log (the parse side is host-grained), the verdict is
    # one partial-aggregable max, and no Python appears anywhere in
    # parse, translate, match, or arg-max
    from pdf_parser_spark.ops.robots import robots_txt_eval

    p = plan_of(robots_txt_eval(spark, "/root/testdata/sf0.001"))
    checks.append(
        ("robots-broadcast-rules-argmax",
         "BroadcastHashJoin" in p
         and "partial_max" in p
         and "Python" not in p
         and "CartesianProduct" not in p)
    )

    # 5. arrow batch size applied
    checks.append(
        (
            "arrow-batch-64",
            spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == "64",
        )
    )

    spark.stop()
    failed = [n for n, ok in checks if not ok]
    for n, ok in checks:
        print(("PASS " if ok else "FAIL ") + n)
    if failed:
        sys.exit(1)
    print("plan audit: all checks passed")


if __name__ == "__main__":
    main()
