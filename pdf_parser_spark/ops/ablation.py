"""Filter-ablation telemetry: the rejection-overlap matrix.

When tuning a curation pipeline, the question after "how many docs
does each filter kill?" is "how many do ONLY this filter kill?" —
a filter whose rejections are a subset of another's adds latency but
no selectivity (the ablation methodology behind FineWeb's filter
study, Penedo et al. 2024, arXiv:2406.17557).  ``filter_overlap_
matrix`` computes, for every pair of the four document-level quality
filters (C4 line rules, CCNet LM perplexity band, Gopher rule
battery, the linear quality classifier), the per-filter rejection
count, the joint rejection count, and the union — 10 rows for the 4
filters' upper triangle including the diagonal.

Verdicts come from CALLING the existing oracle-verified ops — not
re-spelling their formulas — so this telemetry can never drift from
what the standalone filters actually do.  A doc a filter never
scores (e.g. zero tokens: gopher/quality admit only len(tok) > 0)
counts as rejected by it, matching how the funnel would treat it.

Scale shape (100 TB): one documents scan per filter (the price of
formula-reuse; each scan is the same narrow scan-local projection the
standalone op runs, and CCNet's bucket table is the same ≤4096-row
broadcast), then doc_id equi-joins that shuffle only (BIGINT, bool)
pairs, then ONE partial-aggregated conditional-sum reduce to a single
row — the pairwise products are computed inside the same aggregate,
so no filter-to-filter join ever happens — exploded driver-free into
the 10-row matrix.  Output size is O(filters²), independent of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import load_table

FILTERS = ["c4", "ccnet", "gopher", "quality"]


def filter_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_parser_spark.ops.filtering import quality_classifier
    from pdf_parser_spark.ops.heuristics import (
        c4_line_filter,
        ccnet_lm_filter,
        gopher_quality_filter,
    )

    verdicts = {
        "c4": c4_line_filter(spark, sf_dir).select(
            "doc_id", F.col("doc_kept").alias("_k_c4")
        ),
        "ccnet": ccnet_lm_filter(spark, sf_dir).select(
            "doc_id", F.col("kept").alias("_k_ccnet")
        ),
        "gopher": gopher_quality_filter(spark, sf_dir).select(
            "doc_id", F.col("passes").alias("_k_gopher")
        ),
        "quality": quality_classifier(spark, sf_dir).select(
            "doc_id", F.col("kept").alias("_k_quality")
        ),
    }
    df = load_table(spark, sf_dir, "documents").select("doc_id")
    for vdf in verdicts.values():
        df = df.join(vdf, "doc_id", "left")
    rej = {
        n: F.when(F.coalesce(F.col(f"_k_{n}"), F.lit(False)), 0)
        .otherwise(1)
        .cast("long")
        for n in FILTERS
    }
    agg_exprs = [F.sum(rej[a]).alias(f"r_{a}") for a in FILTERS]
    for i, a in enumerate(FILTERS):
        for b in FILTERS[i + 1:]:
            agg_exprs.append(F.sum(rej[a] * rej[b]).alias(f"rb_{a}_{b}"))
    one = df.agg(*agg_exprs)
    cells = []
    for i, a in enumerate(FILTERS):
        for b in FILTERS[i:]:
            r_a, r_b = F.col(f"r_{a}"), F.col(f"r_{b}")
            both = r_a if a == b else F.col(f"rb_{a}_{b}")
            cells.append(
                F.struct(
                    F.lit(a).alias("filter_a"),
                    F.lit(b).alias("filter_b"),
                    r_a.alias("rej_a"),
                    r_b.alias("rej_b"),
                    both.alias("rej_both"),
                    (r_a + r_b - both).alias("rej_union"),
                )
            )
    return one.select(F.explode(F.array(*cells)).alias("s")).select("s.*")


def _overlap_sql() -> str:
    from pdf_parser_spark.ops.filtering import QUALITY_CLASSIFIER_SQL
    from pdf_parser_spark.ops.heuristics import (
        C4_LINE_FILTER_SQL,
        CCNET_LM_FILTER_SQL,
        GOPHER_QUALITY_FILTER_SQL,
    )

    keep_col = {
        "c4": "doc_kept", "ccnet": "kept",
        "gopher": "passes", "quality": "kept",
    }
    src = {
        "c4": C4_LINE_FILTER_SQL, "ccnet": CCNET_LM_FILTER_SQL,
        "gopher": GOPHER_QUALITY_FILTER_SQL, "quality": QUALITY_CLASSIFIER_SQL,
    }
    ctes = ",\n".join(f"f_{n} AS ({src[n]})" for n in FILTERS)
    rejs = ",\n         ".join(
        f"CASE WHEN coalesce(f_{n}.{keep_col[n]}, false) THEN 0 ELSE 1 END"
        f" AS rej_{n}"
        for n in FILTERS
    )
    joins = "\n  ".join(f"LEFT JOIN f_{n} USING (doc_id)" for n in FILTERS)
    singles = ",\n         ".join(
        f"sum(rej_{n})::BIGINT AS r_{n}" for n in FILTERS
    )
    pairs = ",\n         ".join(
        f"sum(rej_{a} * rej_{b})::BIGINT AS rb_{a}_{b}"
        for i, a in enumerate(FILTERS)
        for b in FILTERS[i + 1:]
    )
    rows = "\nUNION ALL ".join(
        f"SELECT '{a}' AS filter_a, '{b}' AS filter_b, r_{a} AS rej_a, "
        f"r_{b} AS rej_b, {(f'r_{a}' if a == b else f'rb_{a}_{b}')} AS "
        f"rej_both, r_{a} + r_{b} - "
        f"{(f'r_{a}' if a == b else f'rb_{a}_{b}')} AS rej_union FROM m"
        for i, a in enumerate(FILTERS)
        for b in FILTERS[i:]
    )
    return f"""
WITH {ctes},
v AS (
  SELECT d.doc_id,
         {rejs}
  FROM documents d
  {joins}
),
m AS (
  SELECT {singles},
         {pairs}
  FROM v
)
{rows}
"""


FILTER_OVERLAP_MATRIX_SQL = _overlap_sql()


QUERIES = {
    "filter_overlap_matrix": (filter_overlap_matrix, FILTER_OVERLAP_MATRIX_SQL),
}
