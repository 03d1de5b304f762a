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

# Round-7 window. Policy: (a) every query NEW or whose
# plan/oracle/operator-closure CHANGED in round 7 heads the window
# (19: thirteen new queries incl. the late-round composites —
# incremental corpus refresh, the table-log-versioned IVF index and
# its append-only incremental-refresh twin — plus the streaming
# change feed and schema evolution; the PMI cap now shared with its
# oracle; the trigram row's counting tier; the table_log queries sit
# over the rewritten sources/table_log.py; the token heavy-hitter
# sits over the weighted-fold sketches.py; the capstone funnel and
# ann_topk_ivf_portable sit over the extracted operators/funnel.py /
# _ivf_train_portable refactors); (b) the remaining 31 slots
# re-confirm by STRICT oldest-evidence order — ALL 22 queries whose
# last driver row is round 2 (the oldest anywhere in the catalog,
# incl. the NOTES-named errors_after_purchase and
# lineitem_measures_unpivot), then 9 of the 22 round-3 rows
# (alphabetical; fuzzy_part_name_match,
# incremental_neardup_probe, nation_revenue_share,
# null_safe_user_join, priority_transition_matrix,
# shard_token_budget, stratified_sample_docs,
# streaming_static_enrich, suppliers_covering_brand,
# top_terms_per_lang, vocab_oov_rate, weekly_active_users, and
# zorder_layout_key defer). Round 8's backlog: those twelve, then
# the 41-query r4 cohort (ANN family, patch grid, sketch/window
# singles), then r5.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) new or changed in round 7
    "pretraining_pipeline_funnel",  # capstone; funnel primitives refactor
    "incremental_corpus_refresh",  # NEW: second composite, reuses stages
    "ann_ivf_index_versioned",  # NEW: IVF index through the table log
    "ann_ivf_index_incremental",  # NEW: append-only index refresh
    "ann_ivf_index_batch",  # NEW: batched serving over the log index
    "ann_recall_at_k",  # NEW: oracled recall@10 of the IVF tier
    "ann_recall_probe_sweep",  # NEW: recall/scan frontier, one index
    "ann_topk_ivf_portable",  # _ivf_train_portable extraction beneath
    "table_log_checkpoint_native_read",  # NEW: ckpt replay + DataSource
    "table_log_writer_roundtrip",  # NEW: native-writer two-phase commit
    "table_log_change_feed",  # NEW: streaming CDF face of the log
    "table_log_schema_evolution",  # NEW: additive evolution via the log
    "collocation_pmi_top",  # _PMI_MAX_POS now shared with the oracle
    "heavy_hitter_char_trigrams",  # direct numpy counting tier
    "heavy_hitter_tokens",  # sketches.py gained the weighted fold
    "table_log_zorder_compact",  # NEW: OPTIMIZE ZORDER through the log
    "table_log_string_pruned_scan",  # NEW: string-stats pruning
    "table_log_time_travel",  # table_log.py rewrite underneath
    "table_log_pruned_scan",  # table_log.py rewrite underneath
    # (b) re-confirmations, strict oldest-evidence first
    # last seated round 2 (all 22)
    "brand_flagship_part",
    "brand_price_stats",
    "daily_from_hourly_rollup",
    "doc_bigrams_udtf",
    "embedding_array_ops",
    "embedding_neardup_pairs",
    "errors_after_purchase",
    "event_date_spine",
    "explode_outer_head3",
    "lineitem_measures_unpivot",
    "nation_order_years",
    "null_handling_ops",
    "order_date_parts",
    "order_priority_profile",
    "order_status_cube",
    "order_value_distribution",
    "part_name_analysis",
    "region_pairs_cross",
    "salted_status_revenue",
    "token_array_set_ops",
    "user_first_last_events",
    "user_sessions",
    # last seated round 3 (9 of 22; fuzzy_part_name_match,
    # incremental_neardup_probe,
    # nation_revenue_share, null_safe_user_join,
    # priority_transition_matrix, shard_token_budget,
    # stratified_sample_docs, streaming_static_enrich,
    # suppliers_covering_brand, top_terms_per_lang, vocab_oov_rate,
    # weekly_active_users, and zorder_layout_key defer to r8)
    "approx_price_quantiles",
    "data_quality_audit",
    "doc_bigram_logprob",
    "doc_chunks",
    "doc_length_histogram",
    "doc_quality_classifier",
    "doc_repetition_stats",
    "doc_shard_assignment",
    "domain_capped_sample",
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

    from .registry import QUERIES

    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    rest = {n: s for n, s in QUERIES.items() if n not in prioritized}
    QUERIES.clear()
    QUERIES.update(prioritized)
    QUERIES.update(rest)
