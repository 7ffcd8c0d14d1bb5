"""Temporal / sequence operators over the events stream and the
training-side document stream: gap sessionization, as-of join, JSON
property extraction, and LM-style sequence packing.

These are the event-log and batch-assembly stages of a crawl→training
pipeline: stitching raw events into sessions, aligning one event type
to the latest preceding occurrence of another (the classic *as-of
join*, an operator Spark has no built-in for — here expressed as a
union + running ``last_value(ignorenulls)`` so it costs ONE shuffle on
the equi-key instead of a range join), pulling typed fields out of a
JSON props column JVM-side, and packing documents into fixed-token
training sequences per input shard.

Every operator has a value-exact DuckDB oracle; the as-of oracle uses
DuckDB's native ``ASOF JOIN`` — a genuinely independent implementation
of the same semantics, not a transliteration of the Spark plan.

Engine-neutral numeric/timestamp rules used throughout:

* epochs are ``unix_micros`` (Spark) / ``epoch_us`` (DuckDB) — exact
  BIGINT microseconds, no float, no timezone rendering in the output;
* summed money-like doubles are carried as BIGINT cents
  (``floor(v*100+0.5)``) so the aggregation order can never produce a
  differing ulp between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdf_parser_spark.ops.common import load_table, tokens, tokens_sql

# sessionize: a new session starts after this much inactivity
SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4 hours
# pack_sequences: training-window capacity in whitespace tokens
PACK_TOKENS = 2048


def ntz_us(colname: str):
    """Naive-epoch microseconds of a TIMESTAMP_NTZ column.

    The sf parquet timestamps are timezone-less (Spark reads them as
    TIMESTAMP_NTZ), so ``unix_micros`` doesn't apply; this diff from a
    fixed NTZ epoch is session-timezone-independent and bit-equal to
    DuckDB's ``epoch_us`` on the same naive values.
    """
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {colname})"
    )


# ---------------------------------------------------------------------------
# sessionize_events — gap-based sessionization
# ---------------------------------------------------------------------------

def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each user's event stream into sessions at >4 h gaps and
    emit per-session rollups.

    Scale: ONE full shuffle of the events table (hash on ``user_id``),
    total.  The per-session groupBy needs ClusteredDistribution on
    ``(user_id, session_idx)``, which the window's ``user_id`` hash
    partitioning already satisfies (subset rule), so Catalyst plans the
    aggregation with NO second exchange — verified in the executed
    plan.  ``(user_id, ts)`` is unique in the events table, so the
    window order is total and the session ids are deterministic.  Sums
    are BIGINT cents — engine-order-proof.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", ntz_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.lag("us").over(w)
    new_session = F.when(
        prev_us.isNull() | ((F.col("us") - prev_us) > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        ev.withColumn("session_idx", F.sum(new_session).over(run))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("value_cents"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count_distinct(F.col("event_type")).alias("n_types"),
        )
    )


SESSIONIZE_EVENTS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       min(epoch_us(ts)) AS start_us,
       max(epoch_us(ts)) AS end_us,
       count(DISTINCT event_type) AS n_types
FROM numbered
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# asof_join_events — latest prior event of another type (as-of join)
# ---------------------------------------------------------------------------

def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ``click`` event, attach the latest ``view`` event of
    the same user at-or-before it (NULL if none) — the as-of join.

    Spark has no as-of operator; the naive spelling is a range join
    (quadratic per user).  This plan is the scalable union trick:
    union the two sides with a type tag, ONE shuffle+sort on
    ``(user_id, ts)``, and a running ``last(ignorenulls)`` carries the
    most recent view forward onto each click row.  Cost is a single
    hash exchange of both inputs — the same shape at 100 TB, no
    range-explosion, no skewed dup-factor.  The tag orders views before
    clicks at equal ``ts`` to pin the standard ``>=`` as-of semantics
    (and ``(user_id, ts)`` is unique here anyway).

    The DuckDB oracle is the engine's native ``ASOF LEFT JOIN`` — an
    independent implementation of the same contract.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", ntz_us("ts").alias("us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "us",
        F.lit(1).alias("is_click"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("v_us"),
        F.lit(None).cast("double").alias("v_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "us",
        F.lit(0).alias("is_click"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("us").alias("v_us"),
        F.col("value").alias("v_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(views).select(
        "user_id",
        "us",
        "is_click",
        "click_id",
        F.last("v_us", ignorenulls=True).over(w).alias("view_us"),
        F.last("v_value", ignorenulls=True).over(w).alias("view_value"),
    )
    return merged.filter(F.col("is_click") == 1).select(
        F.col("click_id"),
        "user_id",
        F.col("us").alias("click_us"),
        "view_us",
        (F.col("us") - F.col("view_us")).alias("gap_us"),
        "view_value",
    )


ASOF_JOIN_EVENTS_SQL = """
SELECT c.event_id AS click_id,
       c.user_id,
       epoch_us(c.ts) AS click_us,
       epoch_us(v.ts) AS view_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us,
       v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


# ---------------------------------------------------------------------------
# json_field_stats — typed field extraction from the JSON props column
# ---------------------------------------------------------------------------

def json_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``$.k`` from the JSON ``props`` column and roll up its
    distribution per event type.

    Scale: ``get_json_object`` is JVM codegen (no Python), the groupBy
    key is 5-way — a broadcast-sized result after map-side combine.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


JSON_FIELD_STATS_SQL = """
SELECT event_type,
       count(*) AS n,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS k_sum,
       min(k) AS k_min,
       max(k) AS k_max
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# pack_sequences — fixed-token training-window packing per shard
# ---------------------------------------------------------------------------

def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each source shard,
    documents in ``doc_id`` order form one token stream cut into
    ``PACK_TOKENS``-sized windows; a document lands in the pack where
    its stream offset starts.  Emits per-pack occupancy rollups — the
    batch-assembly audit for LM training.

    Scale: packing is per-shard by construction (the global-stream
    spelling would be a single-partition window — a non-starter), so
    the only wide op is ONE shuffle on the shard key — the per-pack
    groupBy's ClusteredDistribution on ``(source, pack_id)`` is
    satisfied by the window's ``source`` partitioning, so no second
    exchange is planned.  At 100 TB the shard key is the ingest
    file/partition (thousands of values); the 20-way ``source`` here is
    the sf-table stand-in.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    n_tok = F.size(tokens(F.col("text")))
    cum_before = F.coalesce(
        F.sum(n_tok).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        docs.select(
            "source",
            "doc_id",
            n_tok.alias("n_tok"),
            F.floor(cum_before / PACK_TOKENS).alias("pack_id"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


PACK_SEQUENCES_SQL = f"""
WITH toks AS (
  SELECT source, doc_id,
         len({tokens_sql('text')}) AS n_tok
  FROM documents
), offs AS (
  SELECT source, doc_id, n_tok,
         COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM toks
)
SELECT source,
       CAST(floor(cum_before / {PACK_TOKENS}) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM offs
GROUP BY 1, 2
"""


QUERIES = {
    "sessionize_events": (sessionize_events, SESSIONIZE_EVENTS_SQL),
    "asof_join_events": (asof_join_events, ASOF_JOIN_EVENTS_SQL),
    "json_field_stats": (json_field_stats, JSON_FIELD_STATS_SQL),
    "pack_sequences": (pack_sequences, PACK_SEQUENCES_SQL),
}
