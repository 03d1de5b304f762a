"""Round-5 additions: performance-tier and visibility queries.

The round-5 focus is forensics and at-scale constants rather than new
surface area (the reference's operator inventory has been at full
parity since round 2); the queries here are fast tiers and coverage
reporters for existing operators, each carrying its twin's oracle so
the driver gate value-checks them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens
from ..sources.tpch import load_table
from .advanced import _SQL_ALLOCATION
from .registry import register


@register(
    "inventory_allocation_arrow",
    oracle=_SQL_ALLOCATION,
    doc="Arrow-native twin of the flagship stateful operator "
    "(operators/allocation.py allocate_greedy_arrow): same broadcast "
    "stock join and product-bucket shuffle, worker half on "
    "groupBy().applyInArrow with the shared vectorized greedy kernel. "
    "Registered to pin a MEASURED NEGATIVE RESULT: the worker compute "
    "is cheaper (C++ sort, shared kernel) but applyInArrow's "
    "group-input serializer costs ~4x applyInPandas's on this build "
    "(noop A/B: 4.55s vs 1.08s at sf1, unchanged with 1-row output), "
    "so the pandas tier stays production for large-passthrough "
    "grouped ops; applyInArrow pays only when per-group output is "
    "tiny (label_centroids_arrow). Same recursive-CTE oracle — "
    "results identical by construction (one shared kernel).",
    tags=("stateful", "applyInArrow", "negative-result"),
)
def inventory_allocation_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.allocation import allocate_greedy_arrow

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_extendedprice",
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").cast("int").alias("qty"),
    )
    stock = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"),
        (F.col("p_size") * 40).alias("stock"),
    )
    return allocate_greedy_arrow(
        li,
        stock,
        order_by=("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"),
        buckets=64,
    )


_HH_T = 200  # heavy-hitter threshold divisor: report tokens > n/200
_HH_K = 256  # Misra-Gries counters per partition (t <= k required)


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks),
    c AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
    SELECT tok, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * CAST(1000000 AS BIGINT) // n AS BIGINT) AS share_ppm
    FROM c, tot WHERE cnt * {_HH_T} > n
    """,
    doc="ε-heavy-hitters over document tokens — the frequent-items "
    "sketch family (completing HLL / quantile / Bloom / MinHash / "
    "SimHash): per-partition Misra-Gries summaries (k=256 counters, "
    "mergeable-summaries fold at Arrow-batch granularity, C-speed "
    "value_counts — no per-row Python) generate ≤ k candidates per "
    "partition; the broadcast candidate union is verified EXACTLY and "
    f"filtered at count*{_HH_T} > n. The MG retention guarantee "
    "(any item over n/(k+1) survives some partition's summary) makes "
    "the output the exact true heavy-hitter set, deterministic across "
    "partitionings — so the sketch carries a plain exact-SQL oracle. "
    "At 100 TB the point is SHUFFLE VOLUME: the naive groupBy(token) "
    "shuffles every distinct token per map partition; this plan "
    "shuffles k rows per partition plus the candidate-only exact "
    "pass. Guarantee + Zipf stress pinned in tests/test_sketches.py.",
    tags=("text", "sketch", "heavy-hitters", "mapInPandas"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import explode_nonempty
    from ..operators.sketches import heavy_hitters_exact
    from ..sources.tpch import repartition_for_compute

    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    toks = explode_nonempty(
        docs.select(tokens(F.col("text")).alias("tk")), "tok", F.col("tk")
    )
    return heavy_hitters_exact(toks, "tok", t=_HH_T, k=_HH_K)
