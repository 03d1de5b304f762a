"""Curation-stage operators: connected-components cluster resolution,
deterministic sampling, decontamination, TF-IDF. The oracle equality of
the registered queries is covered by tests/test_oracle.py; here we pin
the operator semantics directly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.operators.graph import (
    component_labels,
    connected_components,
)
from candy_store_etl_spark.plans.curation import (
    benchmark_decontamination,
    neardup_clusters,
    neardup_clusters_minhash,
    stratified_sample_docs,
    tfidf_top_terms,
)


def _cc_truth(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to roots, then label by component min (= root,
    # since we always attach the larger root under the smaller)
    return {v: find(v) for v in range(n_nodes)}


def _labels(spark, n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "src long, dst long"
    ).filter(F.col("src").isNotNull())
    ndf = spark.range(n_nodes).select(F.col("id").alias("node_id"))
    out = component_labels(ndf, edf, "node_id").collect()
    return {r["node_id"]: r["component"] for r in out}


def test_cc_chain_and_islands(spark):
    # 0-1-2-3 chain, 4-5 pair, 6 isolated: worst-case diameter path
    edges = [(0, 1), (1, 2), (2, 3), (4, 5)]
    assert _labels(spark, 7, edges) == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [(1, 0), (0, 1), (1, 1), (2, 1), (2, 0)]
    assert _labels(spark, 3, edges) == {0: 0, 1: 0, 2: 0}


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_cc_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 80))
    ]
    assert _labels(spark, n, edges) == _cc_truth(n, edges)


def test_cc_long_path_needs_many_rounds(spark):
    # a 24-node path exercises multi-round propagation + convergence
    edges = [(i, i + 1) for i in range(23)]
    got = _labels(spark, 24, edges)
    assert set(got.values()) == {0}


def test_connected_components_only_edge_nodes(spark):
    edf = spark.createDataFrame([(10, 20), (20, 30)], "src long, dst long")
    rows = connected_components(edf).collect()
    assert {r["node"]: r["component"] for r in rows} == {10: 10, 20: 10, 30: 10}


def test_neardup_cluster_queries_agree_on_resolver(spark, sf_correctness):
    """The exact-edge and minhash-edge variants share the resolver; both
    must emit one row per doc with a valid canonical structure."""
    for fn in (neardup_clusters, neardup_clusters_minhash):
        rows = fn(spark, sf_correctness).collect()
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for cid, members in by_cluster.items():
            ids = sorted(m["doc_id"] for m in members)
            assert cid == ids[0]  # cluster labeled by its min member
            assert all(m["cluster_size"] == len(members) for m in members)
            canon = [m for m in members if m["is_canonical"] == 1]
            assert len(canon) == 1 and canon[0]["doc_id"] == cid


def test_stratified_sample_rates(spark, sf_correctness):
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sampled = stratified_sample_docs(spark, sf_correctness).collect()
    got: dict[str, int] = {}
    for r in sampled:
        got[r["source"]] = got.get(r["source"], 0) + 1
    rates = {0: 0.125, 1: 0.25, 2: 0.5, 3: 0.75}
    for src, total in totals.items():
        rate = rates[int(src[3:]) % 4]
        # md5 is uniform; with n<=40 per source allow a wide band but
        # require the tiers to separate from 0 and 1
        assert got.get(src, 0) <= total
        assert abs(got.get(src, 0) / total - rate) < 0.35, (src, got.get(src), total)
    # deterministic: a second run returns the identical id set
    again = {r["doc_id"] for r in stratified_sample_docs(spark, sf_correctness).collect()}
    assert again == {r["doc_id"] for r in sampled}


def test_decontamination_excludes_benchmark_docs(spark, sf_correctness):
    rows = benchmark_decontamination(spark, sf_correctness).collect()
    assert rows, "expected at least one contaminated doc in the corpus"
    bench = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_correctness}/documents.parquet")
        .select("doc_id")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "0f")
        .collect()
    }
    for r in rows:
        assert r["doc_id"] not in bench
        assert 1 <= r["n_shared_ngrams"] <= r["n_grams"]
        assert 0.0 < r["contamination"] <= 1.0


def test_tfidf_top_terms_structure(spark, sf_correctness):
    rows = tfidf_top_terms(spark, sf_correctness).collect()
    docs = {}
    for r in rows:
        docs.setdefault(r["doc_id"], []).append(r)
    # every doc emits exactly 3 ranked terms (corpus docs all have >=3
    # distinct tokens), ranks are 1..3 in (tf desc, df asc, term asc) order
    for doc_id, terms in docs.items():
        terms.sort(key=lambda r: r["term_rank"])
        assert [t["term_rank"] for t in terms] == [1, 2, 3]
        keys = [(-t["tf"], t["doc_freq"], t["term"]) for t in terms]
        assert keys == sorted(keys)
        for t in terms:
            assert t["tfidf"] >= 0.0


def test_shard_assignment_bounds_and_determinism(spark, sf_correctness):
    from candy_store_etl_spark.plans.curation import (
        doc_shard_assignment,
        shard_token_budget,
    )

    rows = doc_shard_assignment(spark, sf_correctness).collect()
    assert all(0 <= r["shard"] < 32 for r in rows)
    # md5 sharding balances: every shard populated at 500 docs
    budget = shard_token_budget(spark, sf_correctness).collect()
    assert len(budget) == 32
    assert sum(r["n_docs"] for r in budget) == len(rows)
    assert all(r["total_tokens"] > 0 for r in budget)


def test_incremental_probe_is_asymmetric(spark, sf_correctness):
    from candy_store_etl_spark.plans.curation import (
        incremental_neardup_probe,
        incremental_neardup_probe_lsh,
    )

    incoming = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_correctness}/documents.parquet")
        .select("doc_id")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0")
        .collect()
    }
    for fn in (incremental_neardup_probe, incremental_neardup_probe_lsh):
        rows = fn(spark, sf_correctness).collect()
        assert rows, fn.__name__
        for r in rows:
            assert r["incoming_id"] in incoming
            assert r["match_id"] not in incoming


def test_lsh_probe_equals_symmetric_pairs_across_boundary(spark, sf_correctness):
    """The probe reuses the exact same signatures and banding as the
    symmetric tier, so its candidate set must EQUAL the symmetric LSH
    pair set restricted to (incoming, index) pairs — no slack."""
    from candy_store_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    sigs = minhash_signatures(docs, "doc_id", "text", num_perm=64)
    sym = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, num_perm=64, bands=16).collect()
    }
    incoming_ids = {r["doc_id"] for r in docs.filter(is_new).select("doc_id").collect()}
    expected = set()
    for a, b in sym:
        if (a in incoming_ids) != (b in incoming_ids):
            q, ix = (a, b) if a in incoming_ids else (b, a)
            expected.add((q, ix))
    probe = {
        (r["id_a"], r["id_b"])
        for r in lsh_probe_pairs(
            minhash_signatures(docs.filter(is_new), "doc_id", "text", num_perm=64),
            minhash_signatures(docs.filter(~is_new), "doc_id", "text", num_perm=64),
            num_perm=64,
            bands=16,
        ).collect()
    }
    assert probe == expected
