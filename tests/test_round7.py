"""Round-7 queries: the pretraining-pipeline funnel's structural
invariants and the checkpoint-native-read query's replay evidence.
(Value-level correctness is the driver oracle's job — gate-checked —
these pin the properties the oracle cannot see.)"""

from __future__ import annotations

import pytest

from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded

_ensure_loaded()


@pytest.fixture(scope="module")
def funnel_rows(spark, sf_correctness):
    df = QUERIES["pretraining_pipeline_funnel"].fn(spark, sf_correctness)
    return [tuple(r) for r in df.collect()]


def test_funnel_shape_and_chain(funnel_rows):
    assert [r[0] for r in funnel_rows] == list(range(1, 11))
    assert [r[1] for r in funnel_rows] == [
        "ingest", "quality_filter", "domain_cap", "exact_dedup",
        "neardup_bow", "decontaminate", "mixture_sample", "chunk",
        "pack", "shard_plan",
    ]
    # the funnel chains: stage k's rows_in == stage k-1's rows_out
    for prev, cur in zip(funnel_rows, funnel_rows[1:]):
        assert cur[2] == prev[3], f"{cur[1]} rows_in != {prev[1]} rows_out"


def test_funnel_stage_semantics(funnel_rows):
    by = {r[1]: (r[2], r[3]) for r in funnel_rows}
    # doc-level stages only ever drop rows
    for s in (
        "quality_filter", "domain_cap", "exact_dedup", "neardup_bow",
        "decontaminate", "mixture_sample",
    ):
        assert by[s][1] <= by[s][0], f"{s} grew the corpus"
    # every filter stage that CAN bind on this corpus actually binds
    # (a stage that filters nothing is untested code wearing a green
    # badge). exact_dedup is exempt: the synthetic corpus contains
    # ZERO byte-identical texts at the test SFs (measured; 8 appear at
    # sf0.1) — its window mechanism is the same shape as neardup_bow,
    # which binds, and its pass-through count is still oracle-hashed.
    for s in ("quality_filter", "domain_cap", "neardup_bow",
              "decontaminate", "mixture_sample"):
        assert by[s][1] < by[s][0], f"{s} did not filter anything"
    # chunking fans out; packing compresses; shard plan = ceil(P/16)
    assert by["chunk"][1] >= by["chunk"][0]
    assert by["pack"][1] <= by["pack"][0]
    assert by["shard_plan"][1] == (by["pack"][1] + 15) // 16
    assert by["ingest"][0] == by["ingest"][1]
    assert by["mixture_sample"][1] > 0, "pipeline filtered everything"


def test_funnel_deterministic_across_runs(spark, sf_correctness, funnel_rows):
    again = [
        tuple(r)
        for r in QUERIES["pretraining_pipeline_funnel"]
        .fn(spark, sf_correctness)
        .collect()
    ]
    assert again == funnel_rows


def test_checkpoint_native_read_reports_tail_replay(spark, sf_correctness):
    from candy_store_etl_spark.plans.round7 import _TL_COMMITS

    rows = (
        QUERIES["table_log_checkpoint_native_read"]
        .fn(spark, sf_correctness)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.checkpoint_version == 10
        assert r.entries_replayed == _TL_COMMITS - 1 - 10
