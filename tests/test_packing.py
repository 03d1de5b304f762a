"""Token-budget sequence packing: grouped-map operator vs a plain
sequential simulation, plus next-fit invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.functions.text import tokens
from candy_store_etl_spark.operators.packing import pack_documents
from candy_store_etl_spark.sources.tpch import load_table

BUDGET = 256
SHARDS = 4


@pytest.fixture(scope="module")
def packed(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id",
        (F.col("doc_id") % SHARDS).cast("int").alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_toks"),
    )
    out = pack_documents(docs, budget=BUDGET)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def _simulate(rows):
    """Reference next-fit packer: one plain Python pass per shard."""
    expected = {}
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        seq, fill = 0, 0
        for r in sorted(shard_rows, key=lambda r: r["doc_id"]):
            if fill > 0 and fill + r["n_toks"] > BUDGET:
                seq, fill = seq + 1, 0
            expected[r["doc_id"]] = (seq, fill)
            fill += r["n_toks"]
    return expected


def test_packing_matches_sequential_simulation(spark, sf_smoke, packed):
    docs = (
        load_table(spark, sf_smoke, "documents")
        .select(
            "doc_id",
            (F.col("doc_id") % SHARDS).cast("int").alias("shard"),
            F.size(tokens("text")).cast("long").alias("n_toks"),
        )
        .collect()
    )
    expected = _simulate([r.asDict() for r in docs])
    assert len(packed) == len(expected) > 0
    for doc_id, (seq, off) in expected.items():
        got = packed[doc_id]
        assert (got["seq_id"], got["seq_offset"]) == (seq, off), doc_id


def test_packing_invariants(packed):
    # (a) a doc fits its sequence unless it alone exceeds the budget,
    # in which case it must sit at offset 0 of its own sequence
    for r in packed.values():
        if r["n_toks"] > BUDGET:
            assert r["seq_offset"] == 0
        else:
            assert r["seq_offset"] + r["n_toks"] <= BUDGET
    # (b) per shard: seq ids start at 0 and are contiguous
    by_shard: dict[int, set] = {}
    for r in packed.values():
        by_shard.setdefault(r["shard"], set()).add(r["seq_id"])
    for seqs in by_shard.values():
        assert seqs == set(range(max(seqs) + 1))
