"""End-to-end candy-store pipeline vs the reference's golden answers
(data/answers_5) on its own inputs (data/dataset_5).

Tolerances follow the reference CI's own contract
(`.gitlab-ci.yml:111-193`): money columns np.allclose(rtol=1e-2,
atol=0.01), ids/quantities/stock exact. One caveat from SURVEY §2.3:
the reference itself is nondeterministic on equal-quantity ties (its
Spark join reorders rows feeding the driver loop), and the golden
files embed one such 2-row swap — so line-item quantities are allowed
a tiny mismatch budget while FINAL STOCK MUST BE EXACT.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from candy_store_etl_spark.plans.candy_pipeline import run_pipeline
from candy_store_etl_spark.sources.candy import read_products

REF_DATA = "/root/reference/data/dataset_5"
REF_ANSWERS = "/root/reference/data/answers_5"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference dataset not present"
)

DATES = [f"202402{d:02d}" for d in range(1, 11)]


@pytest.fixture(scope="module")
def outputs(spark):
    products = read_products(spark, os.path.join(REF_DATA, "products.csv"))
    paths = [
        os.path.join(REF_DATA, f"transactions_{d}.json") for d in DATES
    ]
    out = run_pipeline(spark, paths, products)
    return {k: v.toPandas() for k, v in out.items()}


def golden(name: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(REF_ANSWERS, f"{name}.csv"))


def test_products_updated_exact(outputs):
    got = outputs["products_updated"]
    want = golden("products_updated")
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_order_line_items(outputs):
    got = outputs["order_line_items"]
    want = golden("order_line_items")
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    exact_cols = ["order_id", "product_id"]
    for c in exact_cols:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # quantities: reference's own tie nondeterminism → tiny budget
    qdiff = int((got["quantity"].to_numpy() != want["quantity"].to_numpy()).sum())
    assert qdiff <= 4, f"{qdiff} quantity mismatches"
    assert np.allclose(
        got["unit_price"], want["unit_price"], rtol=1e-2, atol=0.01
    )
    tot_diff = int(
        (~np.isclose(got["line_total"], want["line_total"], rtol=1e-2, atol=0.01)).sum()
    )
    assert tot_diff <= 4, f"{tot_diff} line_total mismatches"
    # conservation even on swapped ties: per-product totals must agree
    g = got.groupby("product_id")["quantity"].sum().to_dict()
    w = want.groupby("product_id")["quantity"].sum().to_dict()
    assert {int(k): int(v) for k, v in g.items()} == {
        int(k): int(v) for k, v in w.items()
    }


def test_orders(outputs):
    got = outputs["orders"]
    want = golden("orders")
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in ["order_id", "customer_id", "num_items"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (
        pd.to_datetime(got["order_datetime"]).to_numpy()
        == pd.to_datetime(want["order_datetime"]).to_numpy()
    ).all()
    # the 3 tie-swapped line items (see test_order_line_items) shift
    # the same 3 orders' totals; everything else must be allclose
    bad = ~np.isclose(
        got["total_amount"], want["total_amount"], rtol=1e-2, atol=0.01
    )
    assert int(bad.sum()) <= 4, f"{int(bad.sum())} total_amount mismatches"


def test_daily_summary(outputs):
    got = outputs["daily_summary"]
    want = golden("daily_summary")
    assert list(got.columns) == list(want.columns)
    assert (got["date"].to_numpy() == want["date"].to_numpy()).all()
    assert (got["num_orders"].to_numpy() == want["num_orders"].to_numpy()).all()
    for c in ["total_sales", "total_profit"]:
        assert np.allclose(got[c], want[c], rtol=1e-2, atol=0.01), c


def test_forecast_shape(outputs):
    got = outputs["sales_profit_forecast"]
    # reference CI checks existence only; we pin shape + plausibility
    assert list(got.columns) == ["date", "forecasted_sales", "forecasted_profit"]
    assert len(got) == 1
    assert str(got["date"].iloc[0]) == "2024-02-11"
    assert got["forecasted_sales"].iloc[0] > 0
    assert got["forecasted_profit"].iloc[0] > 0
