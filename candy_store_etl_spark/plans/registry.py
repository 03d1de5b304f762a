"""Central query registry.

Each entry pairs a PySpark query (``fn(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle for DuckDB (``None`` for genuinely
non-SQL-expressible operators — those get rows-only verification).

Naming contract: every computed column is aliased identically in the
Spark plan and the oracle SQL, because the correctness gate sorts
columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


_LOADED = False

# The external correctness driver verifies only the first 50 registered
# queries per round, in registration order.  Rather than contorting
# module import order (round 1/2 approach), the registry reorders
# QUERIES after load according to this explicit priority list: names
# listed here come first (in list order), everything else follows in
# import order.  Round 4 priority: (a) the four oracled queries that
# have never had a driver CORRECTNESS row (round-3 post-window
# additions), each rows-only fast tier seated adjacent to its oracled
# portable twin so the driver file stays self-explaining; (b) the
# 31 queries new in round 4 (sections b1 + b2 below: 20 + 11); (c) 9
# flagship re-confirmations (allocation, daily rollup, the
# minhash/cluster/probe tier pairs, one streaming query).
# 10 + 31 + 9 = 50. Rotated out (all driver-green in earlier rounds):
# pricing_summary, region_revenue, exact_dedup_docs, corpus_curation,
# inventory_allocation_chained.
# Queries absent from the registry are ignored, so this list is safe
# across refactors.
# Round-5 window. The rotation backlog is empty (every oracled query
# has a green driver row from rounds 1-4), so the policy is: (a) every
# query that is NEW or whose plan/oracle/schema CHANGED in round 5
# heads the window, fast tier seated next to its twin; (b) the
# remaining slots re-confirm flagships whose most recent driver row is
# OLDEST (rotated out in r3/r4 or last seen r1/r2), spread across
# every family (relational core, dedup/text, ANN, scale ops,
# warehouse, streaming twins). Rotated out: the 31 round-4-new queries
# plus the r4 re-confirmation tail — all driver-green in
# CORRECTNESS_r04.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) new or changed in round 5
    "inventory_allocation",  # vectorized greedy kernel
    "inventory_allocation_arrow",  # NEW: Arrow twin, same oracle
    "inventory_allocation_chained",  # shares the changed kernel
    "supplier_triangle_count",  # degree-oriented plan + oracle
    "exact_substring_dup_savings",  # + cap-coverage columns
    "variant_props_extract",  # string-typed has_k, TRY_CAST oracle
    "importance_sampled_docs",  # unbounded substr + try_cast
    "token_budget_head_selection_distributed",  # empty-corpus guard
    "pruned_range_scan_stats",  # content-fingerprint + stage-swap
    "heavy_hitter_tokens",  # NEW: MG-candidates + exact-verify
    "temperature_mixture_sample",  # NEW: corpus-derived mixture rates
    "source_mixture_plan",  # NEW: epoch-allocation planning
    # (b) flagship re-confirmations, oldest evidence first
    # relational core (last windowed r1-r3)
    "pricing_summary",
    "order_rollup",
    "brand_revenue",
    "region_revenue",
    "top_orders_per_customer",
    "event_type_pivot",
    "hourly_event_stats",
    "daily_summary",
    # dedup / text analysis
    "exact_dedup_docs",
    "corpus_curation",
    "neardup_clusters",
    "token_jaccard_pairs",
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "tfidf_top_terms",
    "pii_redact_docs",
    "benchmark_decontamination",
    "bloom_decontaminate_docs",
    "doc_packing",
    "dataset_split_assignment",
    # ANN / vectors
    "ann_topk_cosine",
    "ann_topk_blockwise",
    "ann_topk_lsh",
    "embedding_neardup_pairs_lsh",
    "embedding_random_projection",
    # scale ops
    "salted_skew_join_revenue",
    "sessionize_events_gap",
    "range_bucket_join_events",
    "grouped_topk_agg",
    "lateral_top_orders",
    # warehouse / advanced
    "price_history_scd2",
    "snapshot_diff_cdc",
    "monthly_cohort_retention",
    "supplier_pagerank",
    "event_funnel",
    # streaming batch-twins
    "streaming_hourly_stats",
    "streaming_interval_join",
)


def _ensure_loaded() -> None:
    """Import all query modules exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from . import extended  # noqa: F401
    from . import extended2  # noqa: F401
    from . import extended3  # noqa: F401
    from . import scalar_surface  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import advanced  # noqa: F401
    from . import vectors  # noqa: F401
    from . import relational  # noqa: F401
    from . import text  # noqa: F401
    from . import curation  # noqa: F401
    from . import assembly  # noqa: F401
    from . import scrubbing  # noqa: F401
    from . import prep  # noqa: F401
    from . import warehouse  # noqa: F401
    from . import scale_ops  # noqa: F401  # new in round 3
    from . import round4  # noqa: F401  # new in round 4
    from . import round5  # noqa: F401  # new in round 5

    # Reorder so _WINDOW_PRIORITY names come first (driver window).
    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    rest = {n: s for n, s in QUERIES.items() if n not in prioritized}
    QUERIES.clear()
    QUERIES.update(prioritized)
    QUERIES.update(rest)

    _LOADED = True
