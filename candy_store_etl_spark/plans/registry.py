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
# module import order (round 1/2 approach), the registry now reorders
# QUERIES after load according to this explicit priority list: names
# listed here come first (in list order), everything else follows in
# import order.  Round 3 priority: the 45 queries that have never had a
# driver CORRECTNESS row (all of curation/assembly/scrubbing/prep/
# warehouse, the portable LSH twins, the remaining rows-only xxhash
# tiers) plus the queries new this round fill the 50-slot window.
# Queries absent from the registry are ignored, so this list is safe
# across refactors.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # vectors — portable twins + remaining rows-only fast tiers
    "minhash_neardup_pairs_portable",
    "minhash_neardup_pairs_oph",
    "minhash_neardup_pairs_oph_portable",
    "simhash_neardup_pairs_portable",
    "ann_topk_pq",
    "embedding_random_projection",
    # text
    "doc_repetition_stats",
    # curation
    "neardup_clusters",
    "neardup_clusters_minhash",
    "neardup_clusters_minhash_portable",
    "stratified_sample_docs",
    "benchmark_decontamination",
    "tfidf_top_terms",
    "doc_shard_assignment",
    "shard_token_budget",
    "incremental_neardup_probe",
    "incremental_neardup_probe_lsh",
    "incremental_neardup_probe_lsh_portable",
    # assembly
    "doc_packing",
    "streaming_interval_join",
    "streaming_static_enrich",
    # scrubbing
    "pii_redact_docs",
    "domain_capped_sample",
    "doc_bigram_logprob",
    "doc_quality_classifier",
    # prep
    "doc_chunks",
    "dataset_split_assignment",
    "event_funnel",
    "vocab_oov_rate",
    # warehouse
    "price_history_scd2",
    "zorder_layout_key",
    "approx_price_quantiles",
    "supplier_pagerank",
    "lateral_top_orders",
    "null_safe_user_join",
    "data_quality_audit",
    "monthly_cohort_retention",
    "grouped_topk_agg",
    "snapshot_diff_cdc",
    "priority_transition_matrix",
    "suppliers_covering_brand",
    "weekly_active_users",
    "fuzzy_part_name_match",
    "doc_length_histogram",
    "nation_revenue_share",
    # new in round 3 — fill the window to 50
    "bloom_decontaminate_docs",
    "salted_skew_join_revenue",
    "range_bucket_join_events",
    "sessionize_events_gap",
    "top_terms_per_lang",
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

    # Reorder so _WINDOW_PRIORITY names come first (driver window).
    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    rest = {n: s for n, s in QUERIES.items() if n not in prioritized}
    QUERIES.clear()
    QUERIES.update(prioritized)
    QUERIES.update(rest)

    _LOADED = True
