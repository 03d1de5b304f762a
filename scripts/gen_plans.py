"""Generate PLANS.md: the executed physical plan of each headline
query at the bench SF, plus the mechanically-extracted properties the
plan audit enforces (pushed filters, broadcasts, codegen spans, unique
shuffle count). The point: plan quality is reviewable as an artifact,
not just asserted in tests.

Usage: python scripts/gen_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "daily_summary",
    "region_revenue",
    "minhash_neardup_pairs",
    "bloom_decontaminate_docs",
    "inventory_allocation",
    "sessionize_events_gap",
    "salted_skew_join_revenue",
    "range_bucket_join_events",
    "ann_topk_lsh",
    # round-4 headline additions
    "exact_substring_dup_pairs",
    "token_budget_head_selection_distributed",
    "multimodal_patch_grid",
    # round-5: degree-oriented triangles, cap-coverage savings
    "supplier_triangle_count",
    "exact_substring_dup_savings",
    # round-6: the MG pruning row, the shuffle-free chunker, the
    # distributed NTILE, and the heavy-hitter token sketch
    "heavy_hitter_char_trigrams",
    "doc_chunking",
    "curriculum_quality_buckets",
    "heavy_hitter_tokens",
    "collocation_pmi_top",
    # round-7: the capstone funnel (one-scan survival flags +
    # distributed prefix sum)
    "pretraining_pipeline_funnel",
    # round-7 late additions: the second composite (fingerprint-only
    # anti-joins vs the base corpus) and the table-log-versioned IVF
    # index (pinned-version probe-pruned scans)
    "incremental_corpus_refresh",
    "ann_ivf_index_versioned",
    # round-8: the storage-partitioned join (the plan to review is the
    # ABSENCE of table-data exchanges) and the exchange-free bucketed
    # aggregate
    "colocated_customer_join",
    "bucketed_local_aggregate",
    # round-9: the skew-relieved SPJ (the plan to review is the chunked
    # metadata routing — still no table-data exchange) and the
    # anti-join decontamination apply side
    "colocated_skew_split_join",
    "colocated_anti_join_decontaminate",
    "colocated_pruned_range_join",
    # driver-round-11 additions: the range face of the serving front
    # door (stats-pruned scan planned from the log) and the CDC
    # coarsen->refine roundtrip's readback
    "serve_range_pruned",
    "cdc_refine_roundtrip",
    "colocated_left_star_join",
    # round-10: the fused rollup+join (the plan to review is ONE task
    # wave doing agg+join with only the metadata routing exchange) and
    # the serve() keyset regime (bucket-pruned JVM scan + isin)
    "colocated_rollup_join",
    "serve_probe_small",
    # round-11: the join face of the serving router — the broadcast
    # regime (the plan to review is one BroadcastHashJoin stage, no
    # fact exchange) and the colocated regime (zero-exchange SPJ
    # chosen by layout)
    "serve_join_broadcast",
    "serve_join_colocated",
    # round-12: the bloom faces of point serving — the plan to review
    # is the PRUNED parquet scan (5-6 of N files listed) + the cast
    # isin residual, with the probe hashing as its own tiny job; the
    # off-key row additionally proves a bucketed table serving a
    # secondary key the layout cannot route
    "serve_point_bloom_pruned",
    "serve_offkey_bloom_indexed",
]


def main() -> None:
    from candy_store_etl_spark.metrics import (
        count_unique_broadcasts,
        count_unique_shuffles,
    )
    from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
    from candy_store_etl_spark.session import build_session

    _ensure_loaded()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("gen-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("# Headline query plans\n")
    print(
        f"Formatted physical plans at `{sf_dir}` (regenerate with "
        "`python scripts/gen_plans.py`). Properties are extracted "
        "mechanically from the plan text; the full-catalog versions of "
        "these checks run in `tests/test_plan_audit.py`.\n"
    )
    for name in HEADLINE:
        spark.catalog.clearCache()
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()  # AQE finalizes (and annotates codegen) on execution
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        # executed AQE plans append "== Initial Plan ==" after the final
        # plan — count (and show) only the final plan
        tree = tree.split("== Initial Plan ==")[0].rstrip()
        n_shuffle = count_unique_shuffles(tree)
        n_bcast = count_unique_broadcasts(tree)
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        print(f"## {name}\n")
        print(
            f"- unique shuffle exchanges: **{n_shuffle}**, broadcast "
            f"exchanges: **{n_bcast}**, scans with pushed filters: "
            f"**{pushed}**, whole-stage-codegen spans: **{codegen}**"
        )
        doc = " ".join(QUERIES[name].doc.split())
        print(f"- {doc}\n")
        print("```")
        print(tree.rstrip())
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
