"""Training-batch assembly queries: token-budget sequence packing and
the streaming interval join.

Registered LAST (see registry._ensure_loaded) so the round-2 driver
window of 50 stays exactly as tuned; these rotate into the window in a
later round and are meanwhile proven by the local oracle mirror
(tests/test_oracle.py runs the full registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.packing import pack_documents
from ..sources.tpch import load_table
from ..streaming.events import interval_join_streams, run_stream_to_memory
from .registry import register
from .streaming_queries import _events_stream
from .text import _SQL_TOKENS

_PACK_BUDGET = 256
_PACK_SHARDS = 8

# Next-fit packing is a per-shard sequential recurrence (seq/fill reset
# when the next doc would overflow the budget) — same oracle shape as
# the allocation recurrence: a RECURSIVE CTE stepping row_number-by-
# row_number within each shard.
_SQL_PACKING = f"""
    WITH RECURSIVE sized AS (
      SELECT doc_id,
             CAST(doc_id % {_PACK_SHARDS} AS INTEGER) AS shard,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_toks,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id
             ) AS rn
      FROM documents
    ),
    rec AS (
      SELECT doc_id, shard, n_toks, rn,
             CAST(0 AS BIGINT) AS seq_id,
             CAST(0 AS BIGINT) AS seq_offset,
             n_toks AS fill
      FROM sized WHERE rn = 1
      UNION ALL
      SELECT s.doc_id, s.shard, s.n_toks, s.rn,
             CASE WHEN r.fill > 0 AND r.fill + s.n_toks > {_PACK_BUDGET}
                  THEN r.seq_id + 1 ELSE r.seq_id END,
             CASE WHEN r.fill > 0 AND r.fill + s.n_toks > {_PACK_BUDGET}
                  THEN CAST(0 AS BIGINT) ELSE r.fill END,
             CASE WHEN r.fill > 0 AND r.fill + s.n_toks > {_PACK_BUDGET}
                  THEN s.n_toks ELSE r.fill + s.n_toks END
      FROM sized s JOIN rec r
        ON s.shard = r.shard AND s.rn = r.rn + 1
    )
    SELECT doc_id, shard, n_toks, seq_id, seq_offset FROM rec
    """


@register(
    "doc_packing",
    oracle=_SQL_PACKING,
    doc="Token-budget next-fit sequence packing (training-batch "
    "assembly): greedy per-shard recurrence as a bucketed grouped-map "
    "(operators/packing.py); only (doc_id, n_toks) enters the pandas "
    "scan. Oracle: recursive CTE stepping the identical recurrence.",
    tags=("stateful", "applyInPandas", "llm-pipeline"),
)
def doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).cast("int").alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_toks"),
    )
    return pack_documents(docs, budget=_PACK_BUDGET)


@register(
    "streaming_interval_join",
    oracle="""
    SELECT p.user_id, p.event_id AS left_id, e.event_id AS right_id,
           p.value AS left_value,
           CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS lag_micros
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase' AND e.event_type = 'error'
     AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream interval self-join (errors within 30min after a "
    "purchase, same user) with watermarks on both sides so BOTH join "
    "buffers get state expiry — driven to completion and hash-checked "
    "against the batch join oracle (inner-join matches emit as they "
    "form, so bounded replay == batch).",
    tags=("streaming", "join", "range"),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    joined = interval_join_streams(ev, ev, within="30 minutes", watermark="1 hour")
    run_stream_to_memory(joined, "csetl_streaming_ivjoin", output_mode="append")
    return spark.table("csetl_streaming_ivjoin")


@register(
    "streaming_static_enrich",
    oracle="""
    WITH profile AS (
      SELECT user_id,
             COUNT(*) AS user_total_events,
             MIN(ts) AS first_seen
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type,
           p.user_total_events, p.first_seen
    FROM events e JOIN profile p ON e.user_id = p.user_id
    WHERE e.event_type = 'purchase'
    """,
    doc="Stream-static enrichment: a purchase stream joined to a "
    "batch-derived user-profile dimension (broadcast side). The static "
    "relation is planned once and shipped to every stream task — the "
    "canonical streaming feature-lookup shape; the fact stream never "
    "shuffles. Static side fixed for the run => append output == the "
    "batch join, which is the oracle.",
    tags=("streaming", "join", "broadcast"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    profile = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("user_total_events"),
            F.min("ts").alias("first_seen"),
        )
    )
    ev = _events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    enriched = ev.join(F.broadcast(profile), "user_id").select(
        "event_id", "user_id", "event_type", "user_total_events", "first_seen"
    )
    run_stream_to_memory(enriched, "csetl_streaming_enrich", output_mode="append")
    return spark.table("csetl_streaming_enrich")
