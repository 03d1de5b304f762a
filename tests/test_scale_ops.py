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


def test_bloom_footer_estimate_bounds_actual_grams(spark, sf_correctness):
    """r13: the filter is sized from footer metadata (zero Spark jobs)
    instead of a per-execution count(). Sizing never affects results
    (the exact verify join removes false positives) but the estimate
    must stay an UPPER bound of the true bench gram count at every
    test SF so the filter cannot saturate; a stats-less layout must
    fall back to the exact count."""
    from candy_store_etl_spark.functions.text import tokens, word_shingles
    from candy_store_etl_spark.plans.scale_ops import (
        _BLOOM_BENCH_CHAR,
        _BLOOM_N,
        _bench_gram_estimate,
    )
    from candy_store_etl_spark.sources.tpch import load_table

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        docs = load_table(spark, sf_dir, "documents")
        bench = (
            docs.select(
                F.array_distinct(
                    word_shingles(tokens(F.col("text")), _BLOOM_N)
                ).alias("grams"),
                (
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                    == _BLOOM_BENCH_CHAR
                ).alias("is_bench"),
            )
            .filter("is_bench")
            .select(F.explode("grams").alias("gram"))
            .distinct()
        )
        n_actual = bench.count()
        n_est = _bench_gram_estimate(spark, sf_dir, bench)
        assert n_est >= n_actual, (sf_dir, n_est, n_actual)

    # stats-less layout (no documents.parquet at this path): the exact
    # counting fallback takes over
    n_fallback = _bench_gram_estimate(spark, "/tmp/definitely-missing", bench)
    assert n_fallback == n_actual


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


# ---------------------------------------------------------------------------
# Skew handling on ACTUALLY skewed data (round-4 verdict item: the salt
# must be shown fighting real skew, and AQE must be shown splitting the
# unsalted form — task-level balance, not plan shape)
# ---------------------------------------------------------------------------

_HOT_FRACTION_MOD = 5  # every 5th orderkey remaps to the hot key → ~20%


def _skewed_lineitem(spark, sf_dir):
    """lineitem with ~20% of rows remapped onto ONE hot join key."""
    from candy_store_etl_spark.sources.tpch import load_table

    return load_table(spark, sf_dir, "lineitem").withColumn(
        "k",
        F.when(F.col("l_orderkey") % _HOT_FRACTION_MOD == 0, F.lit(1)).otherwise(
            F.col("l_orderkey")
        ),
    )


def _max_partition_rows(df, n, *cols) -> int:
    """Rows in the fullest of ``n`` hash partitions on ``cols`` — the
    input of the worst reduce task under that shuffle partitioning."""
    counts = (
        df.repartition(n, *[F.col(c) for c in cols])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return max(r["cnt"] for r in counts)


def test_salting_balances_reducer_input_on_skewed_keys(spark, sf_correctness):
    """With one key owning ~20% of the fact table, hash partitioning on
    the bare key funnels the whole hot key into ONE reduce task; the
    (key, salt) composite must cut the worst task's input by ~R×."""
    R = 8
    li = _skewed_lineitem(spark, sf_correctness).withColumn(
        "salt", F.pmod(F.hash("l_linenumber", "l_partkey"), F.lit(R))
    )
    hot_rows = li.filter(F.col("k") == 1).count()
    total = li.count()
    assert hot_rows > total // 6  # fixture really is skewed (~20%)

    n_part = 64
    unsalted_max = _max_partition_rows(li, n_part, "k")
    salted_max = _max_partition_rows(li, n_part, "k", "salt")
    # the hot key lands whole in one unsalted task...
    assert unsalted_max >= hot_rows
    # ...and the salt spreads it: worst task shrinks by ~R (allow 2x
    # slack for the other keys hashed into the same partitions)
    assert salted_max <= unsalted_max * 2 // R, (
        f"salted max {salted_max} vs unsalted {unsalted_max} (R={R})"
    )


def test_aqe_splits_skewed_join_without_salt(spark, sf_correctness):
    """The unsalted sort-merge join over the skewed fixture must trigger
    AQE's skew-join split (SortMergeJoin(skew=true) in the FINAL
    adaptive plan) once the skew thresholds reflect the data size —
    the runtime safety net behind the explicit salting pattern.

    Two preconditions discovered empirically (each masks skew handling
    silently, so they're load-bearing documentation as much as setup):
    - the skewed shuffle needs MULTIPLE map tasks — AQE splits a reduce
      partition at map-output granularity, so a single-split scan (one
      small parquet file) leaves nothing to split; hence repartition(16)
      on the fact side first.
    - OptimizeSkewedJoin pattern-matches SMJ(Sort(Shuffle),
      Sort(Shuffle)) only: an aggregate between the dim side's shuffle
      and its sort (e.g. dim = fact.groupBy(k).agg(...)) breaks the
      match and disables the split entirely. The dim here is a plain
      projection so the pattern holds — at scale, salt explicitly when
      a join side carries post-shuffle operators.
    """
    from candy_store_etl_spark.sources.tpch import load_table

    li = _skewed_lineitem(spark, sf_correctness)
    li = li.repartition(16, F.col("l_partkey"))  # multi-mapper shuffle input
    dim = load_table(spark, sf_correctness, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    saved = {
        c: spark.conf.get(c, None)
        for c in [
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(dim.hint("merge"), "k").select(
            "k", "o_orderpriority", "l_quantity"
        )
        # collect() on THIS DataFrame: a sink write would execute a
        # different queryExecution and leave this one isFinalPlan=false
        joined.collect()
        plan = _plan(joined)  # final adaptive plan, post-execution
        assert "isFinalPlan=true" in plan, plan[:500]
        assert re.search(r"SortMergeJoin.*skew=true", plan), plan[:3000]
        assert "AQEShuffleRead skewed" in plan, plan[:3000]
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
