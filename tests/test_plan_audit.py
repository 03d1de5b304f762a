"""Whole-catalog physical-plan audit: no query may silently regress
into a slow shape. Row-at-a-time Python, nested-loop/cartesian joins,
and excessive shuffles are each allowed ONLY where the operator's
design documents them."""

from __future__ import annotations

import re

import pytest

from candy_store_etl_spark.metrics import count_unique_shuffles
from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded

_ensure_loaded()

# the row-at-a-time tier by design (Python UDTF demo)
ALLOW_ROW_PYTHON = {"doc_bigrams_udtf"}
# single-broadcast-row compare or documented all-pairs ground truth
ALLOW_NESTED_LOOP = {
    "ann_topk_cosine",
    "embedding_neardup_pairs",
    "region_pairs_cross",
    # cross join against the single-row broadcast grand total
    "nation_revenue_share",
    # every vector scores all k=16 broadcast centroids (the k-means
    # assignment primitive — k-bounded, never data×data)
    "ann_topk_ivf_portable",
    # round-4: broadcast sides bounded at 1 query row / 3 query rows /
    # the 1-row max-date anchor / 1-row scalar aggregates — never
    # data×data
    "ann_range_search",
    "ann_batch_topk",
    "orders_aging_buckets",
    "supplier_triangle_count",
    # round-5: cap-coverage columns ride a broadcast 1-ROW aggregate
    # cross join (the lazy scalar pattern) — never data×data
    "exact_substring_dup_savings",
    # round-5: the global-total threshold joins as a broadcast 1-row
    # aggregate (same lazy scalar pattern)
    "heavy_hitter_tokens",
    # round-6: same sketch plan over char trigrams — same 1-row total
    "heavy_hitter_char_trigrams",
    # round-6: the PMI denominator joins as a broadcast 1-row bigram
    # total (same lazy scalar pattern)
    "collocation_pmi_top",
    # round-5: mixture rates/plans join the broadcast 1-row corpus
    # totals (source-cardinality × 1 row — never data×data)
    "temperature_mixture_sample",
    "source_mixture_plan",
    # round-7: the decontamination probe list rides a broadcast 1-ROW
    # aggregate (list of benchmark prefixes) cross join, and the
    # funnel assembles from two broadcast 1-row count aggregates —
    # never data×data
    "pretraining_pipeline_funnel",
    # round-10 property-flag oracles: the ANN checks cross-join the
    # broadcast 1-row query vector (the exact-tier pattern), and the
    # dedup quality rows assemble from broadcast 1-ROW flag/count
    # aggregates (the lazy scalar pattern) — never data×data
    "ann_topk_ivf_quality",
    "ann_topk_pq_quality",
    "minhash_neardup_quality",
    "simhash_neardup_quality",
    # the no_leakage verification flag rides a broadcast 1-ROW
    # aggregate cross join (lazy scalar pattern) — never data×data
    "leakage_safe_split",
}
# iterative/multi-stage by design: K chained chunk-rounds, each with
# its own window + grouped-map exchange; pagerank runs 5 Pregel rounds,
# each one join + one grouped sum
ALLOW_MANY_EXCHANGES = {
    "inventory_allocation_chained",
    "supplier_pagerank",
    # round-7 capstone: a 10-stage pipeline in one query — four
    # survival-flag windows (source rank, content-fp, bow-fp, mixture)
    # plus the chunk fan-out's distributed prefix sum (range exchange
    # + p-row offset window) and the final count aggregates; each
    # exchange is a designed pipeline stage, not a regression
    "pretraining_pipeline_funnel",
    # two unrolled Lloyd iterations + final assignment, each its own
    # argmax window + (list,dim) grouped mean — iterative by design
    "ann_topk_ivf_portable",
    "ann_topk_pq_portable",
}
MAX_EXCHANGES = 4
# per-query overrides where the default cap miscounts BY DESIGN
# (counts include the +1 compute-repartition exchange the signature
# operators pay to spread tiny-scan/heavy-derivation chains — see
# sources/tpch.repartition_for_compute):
# minhash caches the signature relation, and the formatted plan
# re-prints the cache-fill subtree (with its exchange) under each of
# the three consumers — executed once, counted thrice.
EXCHANGE_CAP_OVERRIDES = {
    # counts are UNIQUE exchange operator ids (shared/cached subtrees
    # re-print under every consumer; the id dedupes them). Overrides
    # exist only where >4 distinct shuffle boundaries are the honest
    # shape:
    # cluster resolution joins the fact-sized label relation (output of
    # the iterative CC loop, a checkpointed RDD scan with no stats) to
    # the node set AND aggregates it for cluster sizes — the label
    # relation is one row per document, NOT broadcastable at scale, so
    # the extra sort-merge exchange is the honest shape
    "neardup_clusters": 5,
    "neardup_clusters_minhash": 5,
    "neardup_clusters_minhash_portable": 5,
    # incoming-batch and index signature relations each pay a
    # compute-repartition + signature aggregation; plus the banded
    # probe join and the pair distinct
    "incremental_neardup_probe_lsh": 5,
    "incremental_neardup_probe_lsh_portable": 5,
    # five independent constraint checks unioned into one report — each
    # is its own single-row global aggregate (plus the FK anti-join's
    # dedup), all over pre-filtered scans; one exchange per check is
    # the honest shape for a multi-table audit
    "data_quality_audit": 7,
    # round-10 dedup QUALITY AUDITS: each runs the full production
    # sketch pipeline (its own ~6-exchange shape) PLUS an independent
    # exact ground-truth computation (shingle/token explode, per-doc
    # sizes, all-pairs self-join, per-pair rollups) PLUS three 1-row
    # flag aggregates — a verification harness composing two whole
    # pipelines, not a serving operator; every exchange is one of the
    # designed stages. The truth side is gate-fixture-sized by
    # construction (it exists to check the sketch, not to scale).
    "minhash_neardup_quality": 32,
    "simhash_neardup_quality": 28,
    # leakage-safe split composes the portable minhash pipeline (its
    # own ~6-exchange shape), the iterative CC labels (checkpointed
    # RDD scan re-keyed for the split/count joins), the per-split
    # rollup, AND the edge-straddle verification joins — each exchange
    # a designed stage of a four-operator composition
    "leakage_safe_split": 16,
    # three sequential funnel stages, each a per-user pre-aggregation
    # (partial/final pair on a type-filtered scan) feeding the next as
    # a broadcast side, plus the distinct-users anchor — the fact table
    # is never self-joined at fact size, so the exchanges are all on
    # pre-reduced relations
    "event_funnel": 6,
    # bloom prefilter: compute-repartition, bench-gram distinct,
    # position-set distinct, the k broadcast builds for the semi-join
    # chain, exact-verify, final per-doc count — every boundary over a
    # bench-bounded or candidate-bounded relation (never the raw
    # corpus-gram explode, whose membership test is map-side)
    "bloom_decontaminate_docs": 7,
    # round-6 doc-list plan: compute-repartition + df-band aggregate +
    # the keep join's gram-side exchange + the pair count (the
    # per-gram collect_list reuses the join partitioning; the executed
    # sf0.1 plan in PLANS.md shows 3 unique exchanges — the cold
    # sf0.01 audit plan re-prints the cached grams subtree, counting
    # the compute repartition separately). A regression back to the
    # two-sided self-join (5+) trips this cap.
    "exact_substring_dup_pairs": 4,
    # the audited COLD plan re-derives the cached edge AND oriented
    # relations once per consumer (degree union x2, degree joins,
    # wedge left/right, closing edge, edge count) with distinct
    # exchange ids; at execution both caches fill once and the real
    # exchange count is edge build + degree agg + 2 degree joins +
    # wedge join + triangle join + three scalar aggregates (the
    # degree orientation costs 3 extra vertex-keyed exchanges over
    # the id-oriented form — the price of the sqrt(m) wedge bound)
    "supplier_triangle_count": 18,
    # round-6 distributed NTILE: range repartition + per-pid window +
    # per-pid count agg + p-row offset window + final bucket agg — the
    # token_budget_distributed cumsum shape plus one grouped report;
    # every exchange after the range split moves pid- or bucket-sized
    # relations
    "curriculum_quality_buckets": 5,
    # round-6 PMI: compute-repartition + map-combined pair count +
    # the doubled-unigram count + the two vocab-keyed score joins —
    # each over the pair or vocabulary relation (the bigram relation
    # is cached; the cold plan re-prints its subtree per consumer),
    # plus the support-filtered top-k window; never all-pairs
    "collocation_pmi_top": 5,
    # round-6: the per-vector distance relation (d2) feeds BOTH the
    # per-label mean and the final ranked join; uncached cold plans
    # re-print its subtree (cen agg + vec agg) with fresh exchange ids
    # under each consumer — executed once each at vec/label size, never
    # data x data (the broadcast sides are 640-row centroids and
    # 10-row means)
    "embedding_outlier_docs": 6,
}

BATCH_QUERIES = sorted(
    n for n, s in QUERIES.items() if "streaming" not in s.tags
)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_plan_shape(spark, sf_correctness, name):
    # plans are cache-state-dependent (CacheManager substitutes
    # InMemoryRelation by logical-plan match, and earlier tests may
    # have warmed identical plans) — audit the cold shape
    spark.catalog.clearCache()
    df = QUERIES[name].fn(spark, sf_correctness)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    if name not in ALLOW_ROW_PYTHON:
        assert "BatchEvalPython" not in tree, (
            f"{name}: row-at-a-time Python UDF in the plan:\n{tree}"
        )
    if name not in ALLOW_NESTED_LOOP:
        assert "CartesianProduct" not in tree, f"{name}:\n{tree}"
        assert "BroadcastNestedLoopJoin" not in tree, f"{name}:\n{tree}"
    if name not in ALLOW_MANY_EXCHANGES:
        cap = EXCHANGE_CAP_OVERRIDES.get(name, MAX_EXCHANGES)
        n_exchange = count_unique_shuffles(tree)
        assert n_exchange <= cap, (
            f"{name}: {n_exchange} unique shuffles (max {cap}):\n{tree}"
        )


def test_no_untracked_cache_in_query_paths():
    """Every cache/persist in library code must go through the tracked
    layer (candy_store_etl_spark.caching) so embedding applications can
    release a query's working set after the action — a raw .cache()
    inside a registered plan is a leak no consumer can reclaim."""
    import pathlib

    import candy_store_etl_spark

    root = pathlib.Path(candy_store_etl_spark.__file__).parent
    bad = []
    for p in sorted(root.rglob("*.py")):
        if p.name == "caching.py":
            continue
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if re.search(r"\.(cache|persist)\(", line):
                bad.append(f"{p.relative_to(root)}:{i}: {line.strip()}")
    assert not bad, "untracked cache/persist sites:\n" + "\n".join(bad)


def test_tracked_caches_release_fully(spark, sf_correctness):
    """Cache-heavy registered queries (signature caches, persisted
    bigram occurrences, pagerank edge/node persists, pipeline stages)
    must leave the session's CacheManager EMPTY after release_caches()
    — bounded memory for a consumer running the whole catalog."""
    from candy_store_etl_spark.caching import (
        release_caches,
        tracked_count,
    )

    release_caches()
    spark.catalog.clearCache()
    for name in [
        "minhash_neardup_pairs",
        "doc_bigram_logprob",
        "supplier_pagerank",
        "bloom_decontaminate_docs",
    ]:
        QUERIES[name].fn(spark, sf_correctness).write.format("noop").mode(
            "overwrite"
        ).save()
    assert tracked_count() > 0, "expected tracked cache registrations"
    release_caches()
    assert tracked_count() == 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "cached relations survived release_caches()"
    )


# grouped-top-k queries whose rank-filter must push BELOW the sort as
# a WindowGroupLimit (Spark's rank-limit pushdown): without it, every
# group's FULL row set is sorted and materialized through the window,
# which at 100 TB is the difference between shuffling top-k per group
# and shuffling the whole fact table through a sort
GROUPED_TOP_K = [
    "reservoir_sample_per_source",
    "embedding_outlier_docs",
    "top_orders_per_customer",
]


@pytest.mark.parametrize("name", GROUPED_TOP_K)
def test_grouped_topk_pushes_window_group_limit(spark, sf_correctness, name):
    """The EXECUTED plan (AQE-final — collect first, then explain)
    must contain WindowGroupLimit, in both its partial (map-side,
    before the shuffle) and final forms — the round-6 verdict's
    deferred plan assertion (c)."""
    spark.catalog.clearCache()
    df = QUERIES[name].fn(spark, sf_correctness)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    n_wgl = tree.count("WindowGroupLimit")
    assert n_wgl >= 2, (
        f"{name}: expected partial+final WindowGroupLimit below the "
        f"sort, found {n_wgl}:\n{tree}"
    )


def test_versioned_ivf_read_is_zero_shuffle(spark, sf_correctness):
    """Serving top-k from the table-log IVF index moves NO data
    between executors: probe selection is a codebook-sized driver
    computation against committed stats, the scan opens only the
    probed lists' files, and the rerank is a windowed top-k over the
    pruned candidates — zero shuffle exchanges AND zero broadcasts at
    query time (all heavy work happened at BUILD time and was
    committed into the index; PLANS.md pins the same shape)."""
    from candy_store_etl_spark.metrics import count_unique_broadcasts

    spark.catalog.clearCache()
    df = QUERIES["ann_ivf_index_versioned"].fn(spark, sf_correctness)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert count_unique_shuffles(tree) == 0, tree
    assert count_unique_broadcasts(tree) == 0, tree


_SPJ_QUERIES = sorted(
    n
    for n, s in QUERIES.items()
    if n.startswith("colocated_") or n == "cdc_warehouse_colocated_join"
)


@pytest.mark.parametrize("name", _SPJ_QUERIES)
def test_spj_family_has_no_jvm_table_scan(spark, sf_correctness, name):
    """The storage-partitioned-join contract, pinned for EVERY
    registered co-located query at once: table data reaches the plan
    only through the mapInArrow merge (fed by the metadata routing
    relation), never as a JVM parquet scan — a FileScan here would
    mean a side silently fell back to the shuffle path."""
    spark.catalog.clearCache()
    df = QUERIES[name].fn(spark, sf_correctness)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan and "FileScan" not in plan, (
        f"{name}: JVM table scan inside an SPJ plan:\n{plan}"
    )
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, (
        f"{name}: expected the Arrow-side co-located merge:\n{plan}"
    )
