"""Shared deterministic primitives with exact Spark/DuckDB twins.

Every corpus operator is graded by the driver running the Spark plan
AND an ANSI-SQL oracle side by side, so every non-trivial expression
here comes in two byte-equivalent spellings:

* ``h32``: a 32-bit unsigned hash as BIGINT — the first 8 hex chars of
  md5 re-read as an integer.  Spark: ``conv(substr(md5(s),1,8),16,10)``
  cast to long; DuckDB: ``('0x' || substr(md5(s),1,8))::BIGINT``.
  md5 of UTF-8 text is identical everywhere, which makes MinHash /
  SimHash / bucketing reproducible across engines (unlike
  ``xxhash64``/``hash``, whose seeds are engine-specific).
* ``tokens``: whitespace split with empties dropped.

At cluster scale these all run JVM-side inside WholeStageCodegen —
no Python in any of the dedup / similarity / stats plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- 32-bit md5-prefix hash -------------------------------------------------

def h32(col: Column) -> Column:
    """Deterministic 32-bit hash of a string column as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB twin of :func:`h32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def seeded_h32(seed: Column | int, col: Column) -> Column:
    """Hash-family member i: h32(i || '|' || s)."""
    seed_c = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return h32(F.concat_ws("|", seed_c, col))


def seeded_h32_sql(seed_expr: str, expr: str) -> str:
    return h32_sql(f"concat({seed_expr}::VARCHAR, '|', {expr})")


# -- engine-neutral decimal rounding ---------------------------------------

def roundn(col: Column, n: int) -> Column:
    """floor(x*10^n + 0.5)/10^n — identical doubles on every engine.

    Spark's round() HALF_UPs the shortest decimal repr while DuckDB
    rounds the binary value, so they disagree whenever the true value
    sits just under a .5 boundary (e.g. 0.26684999…). This formula is
    plain double arithmetic, bit-identical everywhere.
    """
    scale = float(10**n)
    return F.floor(col * scale + 0.5) / scale


def roundn_sql(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


# -- tokenization -----------------------------------------------------------

def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings dropped (multi-space tolerant)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


TOKENS_SQL = "list_filter(string_split({expr}, ' '), t -> t <> '')"


def tokens_sql(expr: str) -> str:
    return TOKENS_SQL.format(expr=expr)


# -- word shingles (n-grams as space-joined strings) ------------------------

def shingles(tok: Column, n: int) -> Column:
    """Distinct word n-grams of a token array, each joined with ' '.

    Empty array when the document has < n tokens (mirrors the SQL
    twin's empty generate_series).
    """
    idx = F.when(
        F.size(tok) >= n, F.sequence(F.lit(1), F.size(tok) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


def shingles_sql(tok_expr: str, n: int) -> str:
    """DuckDB twin of :func:`shingles`.

    NOTE: DuckDB's list_distinct does NOT preserve order (Spark's
    array_distinct does), so shingle arrays must only feed order-free
    aggregates (min / set counts) — which is all MinHash and Jaccard
    need.
    """
    parts = " || ' ' || ".join(f"({tok_expr})[i + {j}]" for j in range(n))
    return (
        f"list_distinct([({parts}) "
        f"for i in generate_series(1, len({tok_expr}) - {n - 1})])"
    )


# -- the derived dedup corpus ----------------------------------------------

# Near-duplicate structure is injected deterministically: alongside
# every document we add a perturbed twin (last token dropped,
# doc_id + 1_000_000).  The synthetic `documents` table has no natural
# near-dups; MinHash/SimHash/Jaccard must then recover exactly the
# (doc, twin) pairs — a checkable, non-empty oracle for the dedup ops.
DEDUP_CORPUS_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
  FROM documents
),
corpus AS (
  SELECT doc_id, array_to_string(tok, ' ') AS text FROM toks WHERE len(tok) >= 4
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(tok[1:len(tok) - 1], ' ') AS text
  FROM toks WHERE len(tok) >= 4
)
"""


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of DEDUP_CORPUS_SQL: documents ∪ perturbed twins."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("tok")).filter(
        F.size("tok") >= 4
    )
    base = tok.select("doc_id", F.array_join("tok", " ").alias("text"))
    twin = tok.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.slice("tok", 1, F.size("tok") - 1), " ").alias("text"),
    )
    return base.unionByName(twin)


# -- exact integer log2 in millibits -----------------------------------------
#
# floor(log2(x)) from the binary digit count (float log2 misrounds near
# powers of two, flaking the value-hash gate) plus the standard linear
# interpolation between adjacent powers: L(x) = 1000*e + (x - 2^e)*1000
# // 2^e.  Monotone non-decreasing, exact integers, engine-identical.
# Used by ops/heuristics.py (ccnet surprisal) and ops/textstats.py
# (doc entropy).

def log2_mbits(expr: str) -> Column:
    """Spark column: L(expr) where expr is a positive BIGINT SQL
    expression (string form so it can be inlined in F.expr)."""
    e = f"(length(conv({expr}, 10, 2)) - 1)"
    p = f"shiftleft(1L, cast({e} as int))"
    return F.expr(f"{e} * 1000 + (({expr}) - {p}) * 1000 div {p}")


def log2_mbits_sql(expr: str) -> str:
    """DuckDB twin of :func:`log2_mbits`."""
    e = f"(length(printf('%b', {expr})) - 1)"
    p = f"(1::BIGINT << {e})"
    return f"({e} * 1000 + (({expr}) - {p}) * 1000 // {p})"
