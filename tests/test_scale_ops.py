"""Plan-shape pins for the round-3 scale operators: the point of each
query is a specific physical strategy, so the strategy itself is
asserted — oracle equality alone would pass even if the plan silently
regressed to broadcast/cartesian."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded

_ensure_loaded()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_salted_join_executes_as_shuffled_hash(spark, sf_correctness):
    """The salted exchange must actually run: ShuffledHashJoin on the
    composite (orderkey, salt) key, NOT a broadcast that would make the
    salting a no-op (the documented contrast with
    salted_nation_sales_join)."""
    df = QUERIES["salted_skew_join_revenue"].fn(spark, sf_correctness)
    plan = _plan(df)
    m = re.search(r"ShuffledHashJoin \[[^\]]*salt[^\]]*\], \[[^\]]*salt[^\]]*\]", plan)
    assert m, plan[:1500]


def test_bloom_position_set_is_broadcast_and_bounded(spark, sf_correctness):
    """The scale claim: the corpus probes a BROADCAST bloom position
    relation whose cardinality is bounded by m regardless of benchmark
    size — the plan must broadcast the pos join, and the position set
    must fit the bound."""
    from candy_store_etl_spark.plans.scale_ops import bloom_decontaminate_docs

    df = bloom_decontaminate_docs(spark, sf_correctness)
    plan = _plan(df)
    # the might-contain probe is k chained broadcast LEFT SEMI joins
    # against the position relation — map-side, no shuffle
    assert re.search(
        r"BroadcastHashJoin \[p\d#\d+L?\], \[pos#\d+L?\], LeftSemi", plan
    ), plan[:1500]


def test_bloom_prefilter_prunes_before_exact_join(spark, sf_correctness):
    """Candidate grams surviving the bloom must be a superset of the
    true shared grams (no false negatives) and the position relation
    must respect the m bound."""
    from candy_store_etl_spark.functions.text import tokens, word_shingles
    from candy_store_etl_spark.plans.scale_ops import (
        _BLOOM_BENCH_CHAR,
        _BLOOM_BITS_PER_ELEMENT,
        _BLOOM_K,
        _BLOOM_N,
        bloom_m_for,
    )
    from candy_store_etl_spark.sources.tpch import load_table

    docs = load_table(spark, sf_correctness, "documents")
    staged = docs.select(
        "doc_id",
        F.array_distinct(word_shingles(tokens(F.col("text")), _BLOOM_N)).alias(
            "grams"
        ),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            == _BLOOM_BENCH_CHAR
        ).alias("is_bench"),
    )
    bench = (
        staged.filter("is_bench")
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    n_bench = bench.count()
    m_bits = bloom_m_for(n_bench)
    # the sizing rule must keep the filter unsaturated: >= 16 bits per
    # element, so the distinct position count stays well under m and
    # the expected fpp ~(1 - e^(-kn/m))^k remains < 1%
    assert m_bits >= _BLOOM_BITS_PER_ELEMENT * n_bench
    n_positions = (
        bench.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col("gram"), F.lit(s)), F.lit(m_bits))
                        for s in range(_BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
        .count()
    )
    assert n_positions <= m_bits
    assert n_positions <= _BLOOM_K * n_bench


def test_range_bucket_join_has_no_cartesian(spark, sf_correctness):
    """The bucket decomposition must surface as an equi-join (hash or
    sort-merge on 'bucket'), never CartesianProduct/BroadcastNestedLoop."""
    df = QUERIES["range_bucket_join_events"].fn(spark, sf_correctness)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)", plan)


def test_sessionize_single_user_shuffle(spark, sf_correctness):
    """Both window passes and the final per-session aggregate must ride
    ONE hash partitioning on user_id — no second shuffle for the
    (user_id, session_seq) groupBy (subset-key reuse)."""
    df = QUERIES["sessionize_events_gap"].fn(spark, sf_correctness)
    plan = _plan(df)
    n_exchange = len(re.findall(r"[+:]- Exchange", plan))
    assert n_exchange == 1, plan[:2000]
