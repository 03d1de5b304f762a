"""Dataset-preparation queries: token-window chunking, deterministic
split assignment, and event-funnel analytics. All JVM-side built-ins
with DuckDB oracles.

Chunking and split assignment are the last pre-training stages after
curation: long documents become fixed-size token windows with overlap,
and every document gets a stable, data-independent train/val/test
label (hash-derived, so re-runs and backfills land identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist

from ..functions.text import tokens
from ..sources.tpch import load_table
from .registry import register

_CHUNK = 32  # tokens per chunk
_OVERLAP = 8  # tokens shared between consecutive chunks
_STRIDE = _CHUNK - _OVERLAP

_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"


@register(
    "doc_chunks",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    n AS (
      SELECT doc_id, toks,
             GREATEST(1, CAST(CEIL((len(toks) - {_OVERLAP}) * 1.0
                                   / {_STRIDE}) AS INTEGER)) AS n_chunks
      FROM tok
    ),
    c AS (
      SELECT doc_id,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx,
             toks
      FROM n
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(toks[chunk_idx * {_STRIDE} + 1 :
                         chunk_idx * {_STRIDE} + {_CHUNK}]) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(
             toks[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {_CHUNK}],
             ' ')) AS chunk_md5
    FROM c
    """,
    doc=f"Token-window chunking: {_CHUNK}-token chunks with {_OVERLAP}-token "
    "overlap (the context-window packing precursor for training/RAG). "
    "Pure explode + array-slice codegen, no shuffle; chunk text is "
    "emitted as md5 (the gate canonicalizer cannot sort long strings "
    "cheaply, and the digest pins content exactly).",
    tags=("text", "prep"),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("toks") - _OVERLAP) * 1.0 / _STRIDE).cast("int"),
    )
    chunked = docs.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(chunked.toks, F.col("chunk_idx") * _STRIDE + 1, _CHUNK)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# first 6 hex chars of md5 -> integer, via per-char strpos arithmetic
# on the DuckDB side (no hex->int builtin that matches Spark's conv).
_SQL_MD5_INT6 = """
  list_sum(list_transform(generate_series(1, 6),
    i -> (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
         * CAST(16 AS BIGINT) ** (6 - i)))
"""


@register(
    "dataset_split_assignment",
    oracle=f"""
    SELECT doc_id,
           CAST(({_SQL_MD5_INT6}) % 100 AS BIGINT) AS bucket,
           CASE WHEN ({_SQL_MD5_INT6}) % 100 < 80 THEN 'train'
                WHEN ({_SQL_MD5_INT6}) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic train/val/test assignment: bucket = first 6 hex "
    "chars of md5(doc_id) mod 100 -> 80/10/10 split. Hash-derived, so "
    "the label is stable under re-runs, backfills, and repartitioning "
    "— no RNG state to coordinate across executors. Embarrassingly "
    "parallel, no shuffle.",
    tags=("prep", "sampling"),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 100
    )
    staged = docs.select("doc_id", bucket.alias("bucket"))
    return staged.select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "event_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    v AS (SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage,
           v.t_view, c.t_click, p.t_purchase
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
    doc="Ordered conversion funnel (view -> click -> purchase): each "
    "stage's timestamp must strictly follow the previous stage's. "
    "Stage relations are per-user aggregates (tiny), so the chain is "
    "pre-aggregate-then-join — the fact table is scanned once per "
    "stage with a pushed-down event_type filter and never self-joined "
    "at fact size.",
    tags=("events", "window"),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u = ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", stage.alias("funnel_stage"), "t_view", "t_click", "t_purchase")
    )


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    occ AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
    freq AS (SELECT tok, COUNT(*) AS n FROM occ GROUP BY tok),
    vocab AS (
      SELECT tok FROM freq
      ORDER BY n DESC, tok
      LIMIT 25
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
           CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE) / COUNT(*)
             AS oov_rate
    FROM occ o LEFT JOIN vocab v ON o.tok = v.tok
    GROUP BY o.doc_id
    """,
    doc="Tokenizer-vocabulary coverage: build the top-25 corpus vocab "
    "(frequency-ranked, lexicographic tie-break so the cut is total-"
    "ordered) and score each document's out-of-vocabulary token rate. "
    "The vocab is a top-K aggregate (TakeOrdered, driver-size K) "
    "broadcast back against the exploded token relation — documents "
    "shuffle once for the per-doc rollup; the OOV rate is one IEEE "
    "division of exact integers.",
    tags=("text", "prep", "vocab"),
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    occ = docs.select("doc_id", F.explode("toks").alias("tok"))
    occ = occ.transform(tracked_persist)
    vocab = (
        occ.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(25)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        occ.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )
