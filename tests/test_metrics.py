"""Runtime-metric introspection: assert what a query actually DID.

The plan audit (test_plan_audit.py) pins plan SHAPES; these tests pin
runtime BEHAVIOR — shuffle volume through a broadcast join stays
dimension-sized, and the executed row counts match the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from candy_store_etl_spark.metrics import executed_plan_metrics, metric_total
from candy_store_etl_spark.sources.tpch import load_table


def test_broadcast_join_shuffles_only_preaggregated_rows(spark, sf_correctness):
    li = load_table(spark, sf_correctness, "lineitem")
    part = load_table(spark, sf_correctness, "part")
    df = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    # collect() (not count()) — count() builds and runs a DIFFERENT
    # plan, leaving df's own executed-plan metrics at zero
    n = len(df.collect())
    # the only exchange carries partial aggregates (a handful of rows),
    # NOT the 60k-row fact join output: broadcast + map-side combine
    shuffled = metric_total(df, "shuffleBytesWritten")
    assert 0 < shuffled < 10_000, f"shuffle wrote {shuffled} bytes"
    # and the fact scan really produced fact-sized output pre-shuffle
    rows = {
        nm.node: nm.metrics.get("numOutputRows")
        for nm in executed_plan_metrics(df)
        if nm.metrics.get("numOutputRows")
    }
    assert any(v and v >= 50_000 for v in rows.values()), rows
    assert n <= 3


def test_metrics_expose_final_aqe_plan(spark, sf_correctness):
    orders = load_table(spark, sf_correctness, "orders")
    df = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    res = df.collect()
    nodes = [nm.node for nm in executed_plan_metrics(df)]
    # the walker must unwrap AQE wrappers down to the real operators
    assert any("HashAggregate" in n for n in nodes), nodes
    agg_rows = [
        nm.metrics["numOutputRows"]
        for nm in executed_plan_metrics(df)
        if "HashAggregate" in nm.node and "numOutputRows" in nm.metrics
    ]
    # the FINAL aggregate emitted exactly the result rows
    assert min(agg_rows) == len(res), (agg_rows, len(res))


def test_observation_api_collects_inline_metrics(spark, sf_correctness):
    """df.observe(): named aggregates piggyback on the action (no
    second scan) — the in-pipeline data-quality counters pattern
    (row counts, null counts, revenue checksums riding every batch)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from candy_store_etl_spark.sources.tpch import load_table

    obs = Observation("li_quality")
    li = load_table(spark, sf_correctness, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")).alias(
            "price_cents"
        ),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
    )
    out = li.filter(F.col("l_quantity") > 10).count()
    got = obs.get
    exact = load_table(spark, sf_correctness, "lineitem")
    assert got["n_rows"] == exact.count()
    assert got["null_qty"] == 0
    assert out < got["n_rows"]
    want_cents = exact.select(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
    ).first()[0]
    assert got["price_cents"] == want_cents


def test_headline_queries_do_not_spill(spark, sf_correctness):
    """Executed-plan spillSize must be ZERO for the heavy catalog
    queries at the gate SF: spill means a partition outgrew execution
    memory — survivable but slow, and at 100 TB the signal to resize
    spark.sql.shuffle.partitions / maxPartitionBytes. Pinning zero
    here catches a memory-shape regression (e.g. an accidental
    single-partition window over fact data) the plan audit can't see."""
    from candy_store_etl_spark.caching import release_caches
    from candy_store_etl_spark.metrics import executed_plan_metrics
    from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded

    _ensure_loaded()

    for name in [
        "minhash_neardup_pairs",
        "inventory_allocation",
        "exact_substring_dup_pairs",
        "bloom_decontaminate_docs",
    ]:
        df = QUERIES[name].fn(spark, sf_correctness)
        # collect() on THIS DataFrame: a sink write runs a different
        # QueryExecution and leaves df's own metrics at zero (the
        # vacuous-assert trap documented in the first test above)
        df.collect()
        metrics = executed_plan_metrics(df)
        assert any(
            nm.metrics.get("numOutputRows", 0) > 0 for nm in metrics
        ), f"{name}: plan did not execute — metrics would be vacuous"
        spilled = sum(nm.metrics.get("spillSize", 0) for nm in metrics)
        release_caches()
        spark.catalog.clearCache()
        assert spilled == 0, f"{name} spilled {spilled} bytes"
