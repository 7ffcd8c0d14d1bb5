"""Training-data pipeline operators over the corpus tables.

Beyond the reference's extraction pipeline (SURVEY.md §2), a
100 TB-scale training-data engine needs corpus-level operators:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), approximate similarity search (brute-force and
IVF-bucketed cosine top-k), text analysis (language-ID, quality
scoring, token counting, fingerprinting), and multimodal column
plumbing.  Each operator is a Spark-first DataFrame plan (built-in
functions, no per-row Python except the explicitly-stubbed multimodal
decode) with a DuckDB oracle-SQL twin for the driver's correctness
gate.

Registry contract: every module exposes ``QUERIES: dict[name ->
(callable(spark, sf_dir) -> DataFrame, oracle_sql | None)]``.
"""

def all_queries():
    from pdf_parser_spark.ops import (
        assembly,
        bloom,
        clustering,
        containment,
        corpusstats,
        skewjoin,
        normalize,
        curation,
        dedup,
        editverify,
        filtering,
        heuristics,
        linkgraph,
        multimodal,
        selection,
        sketches,
        splits,
        pipeline,
        recrawl,
        similarity,
        substring,
        temporal,
        textstats,
        webcorpus,
    )

    # Module order is load-bearing: the driver's CORRECTNESS pass
    # evaluates only the first 50 registry entries.  The round-3 ops
    # (containment .. bloom) that never entered round 3's window come
    # first, then the modules CHANGED or ADDED in round 4 (filtering's
    # url_host_filter gained PSL semantics; recrawl is new; dedup's
    # dedup_cluster, similarity's ann_lsh_topk, and multimodal's
    # decode changed) — the window covers exactly through curation
    # (entry 50); everything past it is unchanged and holds green rows
    # from CORRECTNESS_r03.json.
    out = {}
    for mod in (
        containment,
        substring,
        linkgraph,
        editverify,
        selection,
        sketches,
        splits,
        heuristics,
        bloom,
        filtering,
        recrawl,
        dedup,
        similarity,
        textstats,
        multimodal,
        pipeline,
        curation,
        webcorpus,
        temporal,
        corpusstats,
        clustering,
        assembly,
        skewjoin,
        normalize,
    ):
        out.update(mod.QUERIES)
    return out
