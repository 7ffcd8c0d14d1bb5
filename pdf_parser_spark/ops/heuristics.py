"""The two canonical webtext cleaning recipes as admission operators:
Gopher quality rules and C4 line filtering.

* ``gopher_quality_filter`` — the rule battery of Gopher App. A1 (Rae
  et al. 2021, arXiv:2112.11446 — public), the de-facto standard
  document-level quality gate: word-count window, mean-word-length
  window, symbol-to-word ratio, bullet-start / ellipsis-end line
  fractions, alphabetic-word fraction, and a required-stopword count.
  Emitted per document with every rule's flag AND the measured
  statistics, so downstream can re-threshold without recomputing.
* ``c4_line_filter`` — C4's line-level cleanup (Raffel et al. 2020
  §2.2, arXiv:1910.10683 — public): keep only lines that end in
  terminal punctuation and have enough words, drop lines carrying
  boilerplate markers (javascript / lorem ipsum / curly brace), then
  drop documents left with too few lines.

Exactness: every statistic is integer fixed-point (ratios at 10^4,
mean word length at 10^2, floor division) so the DuckDB twin is
value-identical — the ops/clustering.py policy.

Lines: the driver's synthetic ``documents.text`` is a single space-
joined token stream, so both engines derive the SAME deterministic
line structure used by ops/webcorpus.py line_dedup (fixed
``LINE_WIDTH``-token lines) — the rules then read naturally (a line's
last token carries the terminal punctuation, its first the bullet).

Scale: both operators are pure per-document array HOFs — zero
shuffle, zero Python, whole-stage codegen end to end; the only
exchange anywhere is whatever the caller does with the verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_parser_spark.ops.common import load_table, tokens, tokens_sql
from pdf_parser_spark.ops.webcorpus import LINE_WIDTH

# -- Gopher App. A1 thresholds (document level) ------------------------------
G_MIN_WORDS, G_MAX_WORDS = 10, 100_000   # paper: 50; synthetic docs are short
G_MIN_MWL_E2, G_MAX_MWL_E2 = 300, 1000   # mean word length in [3, 10]
G_MAX_SYMBOL_E4 = 1_000                  # symbol-to-word ratio < 0.1
G_MAX_BULLET_E4 = 9_000                  # bullet-start lines < 0.9
G_MAX_ELLIPSIS_E4 = 3_000                # ellipsis-end lines < 0.3
G_MIN_ALPHA_E4 = 8_000                   # words with an alpha char > 0.8
G_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
G_MIN_STOPWORDS = 2

# -- C4 §2.2 thresholds (line level) -----------------------------------------
C4_MIN_LINE_WORDS = 3
C4_MIN_KEPT_LINES = 2
C4_BAD_MARKERS = ("javascript", "lorem", "{")
C4_TERMINALS = (".", "!", "?", '"')


def _doc_lines(tok):
    """Fixed-width token lines (the line_dedup convention)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tok), F.lit(LINE_WIDTH)),
        lambda s: F.array_join(F.slice(tok, s, LINE_WIDTH), " "),
    )


_LINES_SQL = (
    "[array_to_string(tok[s : s + {w} - 1], ' ') "
    "for s in generate_series(1, len(tok), {w})]"
).format(w=LINE_WIDTH)


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, mean_word_len_e2, symbol_e4, bullet_e4,
    ellipsis_e4, alpha_e4, n_stop, passes) — Gopher A1 rule battery."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).filter(F.size("tok") >= 1)
    lines = _doc_lines(F.col("tok"))
    n_words = F.size("tok").cast("long")
    total_chars = F.aggregate(
        "tok", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_symbol = F.size(
        F.filter("tok", lambda t: t.contains("#") | t.contains("..."))
    ).cast("long")
    n_alpha = F.size(F.filter("tok", lambda t: t.rlike("[A-Za-z]"))).cast(
        "long"
    )
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("-") | ln.startswith("*")
            | ln.startswith("•"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: ln.endswith("..."))
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            "tok", F.array(*[F.lit(s) for s in G_STOPWORDS])
        )
    ).cast("long")
    stats = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        ((total_chars * 100) / n_words).cast("long").alias("mean_word_len_e2"),
        ((n_symbol * 10_000) / n_words).cast("long").alias("symbol_e4"),
        ((n_bullet * 10_000) / n_lines).cast("long").alias("bullet_e4"),
        ((n_ellipsis * 10_000) / n_lines).cast("long").alias("ellipsis_e4"),
        ((n_alpha * 10_000) / n_words).cast("long").alias("alpha_e4"),
        n_stop.alias("n_stop"),
    )
    return stats.withColumn(
        "passes",
        (F.col("n_words") >= G_MIN_WORDS)
        & (F.col("n_words") <= G_MAX_WORDS)
        & (F.col("mean_word_len_e2") >= G_MIN_MWL_E2)
        & (F.col("mean_word_len_e2") <= G_MAX_MWL_E2)
        & (F.col("symbol_e4") < G_MAX_SYMBOL_E4)
        & (F.col("bullet_e4") < G_MAX_BULLET_E4)
        & (F.col("ellipsis_e4") < G_MAX_ELLIPSIS_E4)
        & (F.col("alpha_e4") > G_MIN_ALPHA_E4)
        & (F.col("n_stop") >= G_MIN_STOPWORDS),
    )


_G_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in G_STOPWORDS) + "]"

GOPHER_QUALITY_FILTER_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql("text")} AS tok FROM documents
),
ok AS (SELECT * FROM toks WHERE len(tok) >= 1),
feat AS (
  SELECT doc_id,
         len(tok)::BIGINT AS n_words,
         list_sum([length(t) for t in tok])::BIGINT AS total_chars,
         len(list_filter(tok, t -> contains(t, '#')
                              OR contains(t, '...')))::BIGINT AS n_symbol,
         len(list_filter(tok, t -> regexp_matches(t, '[A-Za-z]')))::BIGINT
           AS n_alpha,
         {_LINES_SQL} AS lines,
         len(list_intersect(tok, {_G_STOP_SQL}))::BIGINT AS n_stop
  FROM ok
),
stats AS (
  SELECT doc_id, n_words,
         CAST(floor(total_chars * 100 / n_words) AS BIGINT)
           AS mean_word_len_e2,
         CAST(floor(n_symbol * 10000 / n_words) AS BIGINT) AS symbol_e4,
         CAST(floor(len(list_filter(lines, l -> starts_with(l, '-')
                OR starts_with(l, '*') OR starts_with(l, '•')))
                * 10000 / len(lines)) AS BIGINT) AS bullet_e4,
         CAST(floor(len(list_filter(lines, l -> ends_with(l, '...')))
                * 10000 / len(lines)) AS BIGINT) AS ellipsis_e4,
         CAST(floor(n_alpha * 10000 / n_words) AS BIGINT) AS alpha_e4,
         n_stop
  FROM feat
)
SELECT *,
       (n_words >= {G_MIN_WORDS} AND n_words <= {G_MAX_WORDS}
        AND mean_word_len_e2 >= {G_MIN_MWL_E2}
        AND mean_word_len_e2 <= {G_MAX_MWL_E2}
        AND symbol_e4 < {G_MAX_SYMBOL_E4}
        AND bullet_e4 < {G_MAX_BULLET_E4}
        AND ellipsis_e4 < {G_MAX_ELLIPSIS_E4}
        AND alpha_e4 > {G_MIN_ALPHA_E4}
        AND n_stop >= {G_MIN_STOPWORDS}) AS passes
FROM stats
"""


def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_lines, n_kept, kept_md5, doc_kept) — C4 §2.2 line
    cleanup: a line survives iff it ends in terminal punctuation, has
    ≥ C4_MIN_LINE_WORDS words, and carries no boilerplate marker; the
    document survives iff ≥ C4_MIN_KEPT_LINES lines do."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).filter(F.size("tok") >= 1)
    lines = _doc_lines(F.col("tok"))
    term = F.array(*[F.lit(t) for t in C4_TERMINALS])
    keep = F.filter(
        lines,
        lambda ln: F.arrays_overlap(
            F.array(F.substring(ln, -1, 1)), term
        )
        & (F.size(F.split(ln, " ")) >= C4_MIN_LINE_WORDS)
        & ~F.lower(ln).contains(C4_BAD_MARKERS[0])
        & ~F.lower(ln).contains(C4_BAD_MARKERS[1])
        & ~ln.contains(C4_BAD_MARKERS[2]),
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(keep).cast("long").alias("n_kept"),
        F.md5(F.array_join(keep, "\n").cast("binary")).alias("kept_md5"),
        (F.size(keep) >= C4_MIN_KEPT_LINES).alias("doc_kept"),
    )


_C4_TERM_SQL = "[" + ", ".join(f"'{t}'" for t in C4_TERMINALS) + "]"

C4_LINE_FILTER_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql("text")} AS tok FROM documents
),
ok AS (SELECT * FROM toks WHERE len(tok) >= 1),
lined AS (
  SELECT doc_id, {_LINES_SQL} AS lines FROM ok
),
kept AS (
  SELECT doc_id, lines,
         list_filter(lines, l ->
           list_contains({_C4_TERM_SQL}, l[-1:])
           AND len(string_split(l, ' ')) >= {C4_MIN_LINE_WORDS}
           AND NOT contains(lower(l), '{C4_BAD_MARKERS[0]}')
           AND NOT contains(lower(l), '{C4_BAD_MARKERS[1]}')
           AND NOT contains(l, '{C4_BAD_MARKERS[2]}')) AS keep
  FROM lined
)
SELECT doc_id,
       len(lines)::BIGINT AS n_lines,
       len(keep)::BIGINT AS n_kept,
       md5(COALESCE(array_to_string(keep, chr(10)), '')) AS kept_md5,
       (len(keep) >= {C4_MIN_KEPT_LINES}) AS doc_kept
FROM kept
"""


QUERIES = {
    "gopher_quality_filter": (gopher_quality_filter, GOPHER_QUALITY_FILTER_SQL),
    "c4_line_filter": (c4_line_filter, C4_LINE_FILTER_SQL),
}
