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
        similarity,
        substring,
        temporal,
        textstats,
        webcorpus,
    )

    out = {}
    for mod in (
        dedup,
        similarity,
        textstats,
        multimodal,
        pipeline,
        curation,
        webcorpus,
        filtering,
        temporal,
        corpusstats,
        clustering,
        assembly,
        skewjoin,
        normalize,
        containment,
        substring,
        linkgraph,
        editverify,
        selection,
        sketches,
        splits,
        heuristics,
        bloom,
    ):
        out.update(mod.QUERIES)
    return out
