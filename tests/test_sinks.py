"""Sinks (reference op-4) and the staged pipeline form (§3.3): the
single-file CSV report sink must produce exactly one named file, and
the parquet-staged pipeline must agree with the in-memory one."""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.sources.sinks import save_single_csv

REF_DATA = "/root/reference/data/dataset_5"


def test_save_single_csv_one_named_file(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("double_id")
    )
    out = save_single_csv(df.orderBy("id"), str(tmp_path / "reports"), "r.csv")
    assert out == str(tmp_path / "reports" / "r.csv")
    assert os.listdir(tmp_path / "reports") == ["r.csv"]
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "double_id"]
    assert len(rows) == 101
    assert rows[1] == ["0", "0"] and rows[100] == ["99", "198"]


def test_save_single_csv_overwrites(spark, tmp_path):
    d = str(tmp_path / "reports")
    save_single_csv(spark.range(5), d, "r.csv")
    save_single_csv(spark.range(3), d, "r.csv")
    with open(os.path.join(d, "r.csv")) as f:
        assert len(list(csv.reader(f))) == 4  # header + 3


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference dataset not present"
)
def test_staged_pipeline_matches_inmemory(spark, tmp_path):
    from candy_store_etl_spark.plans.candy_pipeline import (
        run_pipeline,
        run_pipeline_staged,
    )
    from candy_store_etl_spark.sources.candy import read_products

    products = read_products(spark, os.path.join(REF_DATA, "products.csv"))
    paths = [
        os.path.join(REF_DATA, f"transactions_202402{d:02d}.json")
        for d in range(1, 3)  # two days keeps it quick
    ]
    mem = run_pipeline(spark, paths, products)
    staged = run_pipeline_staged(spark, paths, products, str(tmp_path / "stg"))
    for name in ("order_line_items", "orders", "products_updated", "daily_summary"):
        a = [tuple(r) for r in mem[name].collect()]
        b = [tuple(r) for r in staged[name].collect()]
        assert a == b, f"{name}: staged != in-memory"
    # the stage boundary is real parquet on disk
    assert os.path.isdir(tmp_path / "stg" / "line_items")
    assert os.path.isdir(tmp_path / "stg" / "orders")
