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
_WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) never-windowed oracled queries + fast-tier/twin pairs
    "ann_topk_ivf",
    "ann_topk_ivf_portable",
    "ann_topk_pq",
    "ann_topk_pq_portable",
    "multimodal_segment_audio",
    "ann_topk_arrow",
    "minhash_neardup_pairs",
    "minhash_neardup_pairs_portable",
    "simhash_neardup_pairs",
    "simhash_neardup_pairs_portable",
    # (b) new in round 4
    "ann_range_search",
    "ann_batch_topk",
    "label_centroids",
    "embedding_quantize_int8",
    "token_budget_head_selection",
    "token_budget_head_selection_distributed",
    "importance_sampled_docs",
    "part_name_levenshtein_match",
    "interpolate_daily_gaps",
    "daily_value_regression",
    "daily_value_anomalies_mad",
    "price_window_distribution",
    "user_event_bitmask",
    "brand_price_mode_median",
    "orders_aging_buckets",
    "order_cube_grouping_id",
    "variant_props_extract",
    "pipe_syntax_daily_orders",
    "doc_char_entropy",
    "multimodal_patch_grid",
    # (b2) round-4 batch-3 additions (registered after the first
    # window draft; all gate-sim green)
    "label_centroids_arrow",
    "hll_sketch_users",
    "event_type_pivot_native",
    "safe_arithmetic_ops",
    "products_merge_upsert",
    "exact_substring_dup_pairs",
    "bpe_top_pairs",
    "dataset_card_stats",
    "pruned_range_scan_stats",
    "exact_substring_dup_savings",
    "supplier_triangle_count",
    # (c) flagship re-confirmations + remaining fast-tier/twin pairs
    # (pricing_summary / region_revenue / exact_dedup_docs /
    # corpus_curation / inventory_allocation_chained rotate out:
    # driver-green in earlier rounds, their slots buy first-time rows
    # for section b2's last five queries — with this, EVERY oracled
    # query in the catalog has had a driver window slot by the end of
    # round 4)
    "inventory_allocation",
    "daily_summary",
    "minhash_neardup_pairs_oph",
    "minhash_neardup_pairs_oph_portable",
    "neardup_clusters_minhash",
    "neardup_clusters_minhash_portable",
    "incremental_neardup_probe_lsh",
    "incremental_neardup_probe_lsh_portable",
    "streaming_dedup_events",
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
