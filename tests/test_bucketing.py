"""Bucketed co-located join: the write-once-shuffle-never storage
layout. The assertion is on the physical plan — an equi-join of two
tables bucketed on the join key must contain NO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.sources.bucketing import read_bucketed, write_bucketed
from candy_store_etl_spark.sources.tpch import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_correctness):
    write_bucketed(
        load_table(spark, sf_correctness, "orders"),
        "orders_b",
        buckets=N_BUCKETS,
        key="o_orderkey",
        sort_by="o_orderkey",
    )
    write_bucketed(
        load_table(spark, sf_correctness, "lineitem"),
        "lineitem_b",
        buckets=N_BUCKETS,
        key="l_orderkey",
        sort_by="l_orderkey",
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    o = read_bucketed(spark, orders_t)
    li = read_bucketed(spark, lineitem_t)
    # force the SMJ path (broadcast would hide the bucketing win)
    joined = li.hint("merge").join(
        o, li.l_orderkey == o.o_orderkey
    ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan, plan
    # bucket metadata reached the scan
    assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan, plan
    # exactly ONE Exchange tree node — the final tiny aggregation; the
    # join itself reads co-located buckets with no shuffle
    import re

    tree_exchanges = re.findall(r"[+:]- Exchange", plan)
    assert len(tree_exchanges) == 1, plan
    join_tree = plan.split("SortMergeJoin", 1)[1].split("(1) Scan", 1)[0]
    assert "Exchange" not in join_tree, plan


def test_bucketed_join_matches_unbucketed(spark, sf_correctness, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    bucketed = (
        read_bucketed(spark, lineitem_t)
        .hint("merge")
        .join(
            read_bucketed(spark, orders_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, sf_correctness, "lineitem")
        .join(
            load_table(spark, sf_correctness, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
