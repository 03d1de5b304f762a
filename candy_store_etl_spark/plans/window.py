"""Driver-window ordering and the plan-module loader.

Split out of ``registry.py`` (round-6, judge item 8): the registry
module is in EVERY query's import closure, so while the window list
lived there a rotation invalidated all ~173 incremental gate-cache
fingerprints even though ordering never changes a query's RESULT.
This module holds exactly the two things that affect ordering but not
results — the priority list and the loader import list — and
``scripts/gate_sim.py`` excludes it from every closure.

The external correctness driver verifies only the first 50 registered
queries per round, in registration order; the registry reorders
QUERIES after load according to ``_WINDOW_PRIORITY``: names listed
here come first (in list order), everything else follows in import
order. Names absent from the registry are ignored, so the list is
safe across refactors.
"""

from __future__ import annotations

# Round-8/9 window. Policy: (a) every query NEW or whose
# plan/oracle/operator-closure CHANGED this round heads the window
# (30: the nine round-8 queries — the co-located join pair + the
# three-table star, the bucketed point lookup + local aggregate, the
# multi-probe LSH tier, its recall sweep, and the margin-directed
# probe comparison + its serving op; the eight table_log faces plus
# the three versioned IVF queries, the incremental-refresh composite,
# and the IVF probe sweep over the round-8
# table_log.py/table_log_source.py hardening; ann_topk_lsh over the
# similarity.py multi-probe refactor; then the SEVEN round-9 SPJ
# queries — the streamed-CDC warehouse join, the native-writer join,
# the left-outer coverage and anti-join decontamination forms, the
# row-group skew split, zone-map pruning composed with the layout,
# and the left-outer N-way star); (b) the remaining 20 slots
# re-confirm by STRICT oldest-evidence order — ALL 13 queries whose
# last driver row is round 3, then 7 of the round-4 cohort
# (alphabetical). Round 10's backlog: the 10 freshly-evicted r4 rows
# noted below, the remaining r4 rows, then the 46 r5 rows.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) new or changed in round 8
    "colocated_customer_join",  # NEW: storage-partitioned join
    "colocated_join_coarse_layout",  # NEW: SPJ across mixed layouts
    "bucketed_point_lookup",  # NEW: one-file point-read contract
    "bucketed_local_aggregate",  # NEW: exchange-free per-key agg
    "ann_topk_lsh_multiprobe",  # NEW: Hamming<=2 probe serving tier
    "ann_recall_lsh_sweep",  # NEW: LSH recall/scan frontier
    "ann_recall_lsh_directed",  # NEW: margin-directed probe order
    "ann_topk_lsh_directed",  # NEW: the directed-probe serving op
    "colocated_three_table_join",  # NEW: N-way SPJ, one task wave
    "table_log_time_travel",  # table_log.py hardened underneath
    "table_log_pruned_scan",  # committed-schema pruned reads
    "table_log_checkpoint_native_read",
    "table_log_writer_roundtrip",  # writer fsyncs + pinned appends
    "table_log_change_feed",  # ranged reads + dataChange skip
    "table_log_schema_evolution",  # append re-validates at commit base
    "table_log_zorder_compact",
    "table_log_string_pruned_scan",
    "ann_ivf_index_versioned",  # served through the hardened log
    "ann_ivf_index_incremental",
    "ann_ivf_index_batch",
    "incremental_corpus_refresh",  # appends through the hardened log
    "ann_recall_probe_sweep",  # serves from the committed index
    "ann_topk_lsh",  # query_probe_buckets refactored beneath
    "cdc_warehouse_colocated_join",  # NEW: stream-then-SPJ end-to-end
    "colocated_native_writer_join",  # NEW: bucketBy native writer
    "colocated_left_join_coverage",  # NEW: outer SPJ, null-filled
    "colocated_anti_join_decontaminate",  # NEW: anti SPJ blocklist
    "colocated_skew_split_join",  # NEW: row-group skew relief
    "colocated_pruned_range_join",  # NEW: zone-map pruning in the SPJ
    "colocated_left_star_join",  # NEW: left-outer N-way star
    "bucketed_keyset_lookup",  # NEW: one-wave keyset serving
    "colocated_pruned_range_join_right",  # NEW: right-side zone maps
    "cdf_materialized_view_maintenance",  # NEW: CDF -> CDC matview
    # (b) re-confirmations, strict oldest-evidence first
    # last seated round 3 (all 13)
    "fuzzy_part_name_match",
    "incremental_neardup_probe",
    "nation_revenue_share",
    "null_safe_user_join",
    "priority_transition_matrix",
    "shard_token_budget",
    "stratified_sample_docs",
    "streaming_static_enrich",
    "suppliers_covering_brand",
    "top_terms_per_lang",
    "vocab_oov_rate",
    "weekly_active_users",
    "zorder_layout_key",
    # last seated round 4 (14 of 40, alphabetical; the rest defer)
    "ann_batch_topk",
    "ann_range_search",
    "ann_topk_pq",
    "ann_topk_pq_portable",
    # (hll_sketch_users and the incremental_neardup_probe_lsh +
    # _portable pair evicted to the r9 backlog head when the three
    # late round-8 queries were seated; embedding_quantize_int8,
    # event_type_pivot_native, dataset_card_stats, doc_char_entropy,
    # daily_value_regression, daily_value_anomalies_mad,
    # brand_price_mode_median, bpe_top_pairs, ann_topk_arrow and
    # ann_topk_ivf followed as the ten new round-9 SPJ/serving/IVM
    # queries landed — backlog order: those thirteen, then the
    # remaining r4 rows, then the 46 r5 rows)
    )


def ensure_loaded() -> None:
    """Import all query modules exactly once (they self-register),
    then reorder the registry so ``_WINDOW_PRIORITY`` names come
    first (the driver window)."""
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
    from . import round6  # noqa: F401  # new in round 6
    from . import round7  # noqa: F401  # new in round 7
    from . import round8  # noqa: F401  # new in round 8
    from . import round9  # noqa: F401  # round 8, continued
    from . import round10  # noqa: F401  # new in round 9

    from .registry import QUERIES

    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    rest = {n: s for n, s in QUERIES.items() if n not in prioritized}
    QUERIES.clear()
    QUERIES.update(prioritized)
    QUERIES.update(rest)
