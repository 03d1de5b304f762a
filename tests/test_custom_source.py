"""Python DataSource (candy_transactions): planning-time date pruning,
parallel per-day partitions, agreement with the JSON reader."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.sources.candy import read_transactions
from candy_store_etl_spark.sources.custom_source import (
    CandyTransactionsDataSource,
)

REF_DATA = "/root/reference/data/dataset_5"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference dataset not present"
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(CandyTransactionsDataSource)


def _load(spark, start: str, end: str):
    return (
        spark.read.format("candy_transactions")
        .option("path", REF_DATA)
        .option("start", start)
        .option("end", end)
        .load()
    )


def test_full_range_matches_json_reader(spark):
    via_source = _load(spark, "20240201", "20240210")
    paths = [
        os.path.join(REF_DATA, f"transactions_202402{d:02d}.json")
        for d in range(1, 11)
    ]
    via_json = read_transactions(spark, paths)
    assert via_source.count() == via_json.count() == 10_000
    # spot-check content equality on one day
    a = sorted(
        (r.transaction_id, r.customer_id, len(r.items or []))
        for r in via_source.filter(F.col("day") == "20240203").collect()
    )
    b = sorted(
        (r.transaction_id, r.customer_id, len(r.items or []))
        for r in read_transactions(
            spark, os.path.join(REF_DATA, "transactions_20240203.json")
        ).collect()
    )
    assert a == b


def test_date_range_prunes_partitions(spark):
    pruned = _load(spark, "20240201", "20240203")
    days = {r.day for r in pruned.select("day").distinct().collect()}
    assert days == {"20240201", "20240202", "20240203"}
    # partition count == day count (planning-time pruning)
    assert pruned.rdd.getNumPartitions() == 3


def test_empty_range_raises(spark):
    with pytest.raises(Exception, match="within"):
        _load(spark, "19990101", "19990102").count()
