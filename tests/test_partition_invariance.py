"""Results must not depend on parallelism: the same query at a
different ``spark.sql.shuffle.partitions`` (a different cluster size)
must produce identical rows. This is the correctness face of the
100 TB story — any operator whose output drifts with partition count
(order-dependent float accumulation, per-partition RNG, collect_list
order leaking into results) is broken at scale even if one fixed
local layout happens to pass the oracle.

Representative set: every execution tier that could plausibly be
partition-sensitive — grouped-map pandas (allocation), banded LSH
(minhash), window chains (SCD2, sessions), integer-floored LM scoring,
float money aggregation, and the OPH signature's collect_list-built
map.
"""

from __future__ import annotations

import pytest

from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded

_ensure_loaded()

REPRESENTATIVES = [
    "inventory_allocation",
    "minhash_neardup_pairs",
    "minhash_neardup_pairs_oph",
    "price_history_scd2",
    "user_sessions",
    "doc_bigram_logprob",
    "daily_summary",
    "linear_forecast_daily_value",
    # iterative graph rounds in integer micro-units — the float
    # formulation this operator deliberately avoids would fail here
    "supplier_pagerank",
    # round-2 additions: sequential-stage funnel joins, cohort month
    # arithmetic, the WAU contribution explode, and the CDC full-outer
    # classification — each a shape where partition count could
    # plausibly leak into results
    "event_funnel",
    "monthly_cohort_retention",
    "weekly_active_users",
    "snapshot_diff_cdc",
    # round-3 additions: the integer-quantized k-means twin (Lloyd
    # means must be partition-order-free), the bloom prefilter
    # (candidate set must not depend on probe partitioning), and the
    # two-window sessionizer
    "ann_topk_ivf_portable",
    "ann_topk_pq_portable",
    "bloom_decontaminate_docs",
    "sessionize_events_gap",
    # round-4 additions: integer-micro centroid means (expression AND
    # Arrow-grouped tiers), the fixed-range distributed cumsum (its
    # internal range partitioning must not inherit the session shuffle
    # count), micronat entropy sums, integer-exact OLS, and the
    # MAD discrete medians (collect_list order must not leak)
    "label_centroids",
    "label_centroids_arrow",
    "token_budget_head_selection_distributed",
    "doc_char_entropy",
    "daily_value_regression",
    "daily_value_anomalies_mad",
    # late-round-4 additions: gram-keyed candidate joins + component
    # closure, ordered top-k over counts, and the oriented wedge joins
    "exact_substring_dup_pairs",
    "exact_substring_dup_savings",
    "bpe_top_pairs",
    "supplier_triangle_count",
    # round-5 additions: sketch-pruned exact verify (MG candidates
    # differ per partitioning, the verified output must not), the
    # hash-lottery mixture sample, and the split-arithmetic plan
    "heavy_hitter_tokens",
    "temperature_mixture_sample",
    "source_mixture_plan",
    # round-6 additions: the sketch row whose candidates REALLY differ
    # per partitioning (377 distinct > k=128 — verified output must
    # not), the distributed-ntile bucket assignment (range partition
    # count must not leak into bucket membership), the centroid-
    # distance ranking, and the md5-ranked per-group sample
    "heavy_hitter_char_trigrams",
    "curriculum_quality_buckets",
    "embedding_outlier_docs",
    "reservoir_sample_per_source",
    "collocation_pmi_top",
    # r12 optimization: the funnel's pack stage now derives its
    # prefix-sum pid from footer-stats doc_id buckets instead of a
    # physical range exchange — bin assignment must stay independent
    # of every parallelism knob
    "pretraining_pipeline_funnel",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(x) for x in (row[c] for c in cols)) for row in df.collect()
    )


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_to_shuffle_partitions(spark, sf_smoke, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        few = _canon(QUERIES[name].fn(spark, sf_smoke))
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        many = _canon(QUERIES[name].fn(spark, sf_smoke))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert few == many, f"{name}: output depends on shuffle partition count"
