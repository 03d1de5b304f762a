"""The candy pipeline composed with the table-log/SPJ surface: stage
boundaries become hash-bucketed, versioned table-log tables, and the
orders-rollup-joins-headers pass rides the fused co-located
aggregate-join — zero exchange of line items, rollups, or headers.

``run_pipeline_staged`` (the reference's Airflow DAG done right,
`plans/candy_pipeline.py:234`) exchanges stages via plain parquet: a
resumable boundary, but each stage re-shuffles what the next one
joins, and stage outputs have no history. This variant writes each
stage bucketed on its join key through the table log, so:

- the per-order rollup + headers join of
  ``build_orders_with_profit`` (reference's SECOND full scan,
  `data_processor.py:310-326`) runs as ONE task wave over aligned
  bucket groups (``colocated_aggregate_join``) — at 100 TB the only
  exchange in that stage moves one metadata row per bucket group;
- every stage output is a versioned snapshot: yesterday's line items
  are one ``version=`` away (time travel), a re-run lands as a new
  atomic version instead of clobbering parquet in place, and
  downstream consumers can follow the stage's change feed.

Output parity with ``run_pipeline`` is pinned in
``tests/test_candy_colocated.py`` over the reference's own dataset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_cache
from ..operators.colocated import colocated_aggregate_join, write_bucketed
from ..sources import table_log as tl
from .candy_pipeline import (
    _ROUND2,
    build_daily_summary,
    build_forecast,
    build_line_items,
    build_products_updated,
    load_daily_transactions,
)


# ONE definition of the fused-orders stage, shared with the
# orchestrated DAG's table_log branch (orchestration/candy_dag.py):
# both claim golden parity, so the profit-term expression, the header
# dedup, the agg list, and the rounding point must not be able to
# drift apart.
FUSED_ORDER_AGGS = [
    ("line_total", "sum", "amount_raw"),
    ("order_id", "count", "num_items"),
    ("profit_term", "sum", "order_profit"),
]


def line_items_with_profit_term(li: DataFrame) -> DataFrame:
    """Stage-1 line items plus the precomputed profit term, so the
    fused rollup is a pure stored-column aggregate."""
    return li.withColumn(
        "profit_term",
        F.col("line_total") - F.col("quantity") * F.col("cost_to_make"),
    )


def dedup_headers(txns: DataFrame) -> DataFrame:
    """One header row per order (reference's dropDuplicates)."""
    return txns.select(
        F.col("transaction_id").alias("order_id"),
        F.col("timestamp").alias("order_datetime"),
        "customer_id",
    ).dropDuplicates(["order_id"])


def fused_orders_select(rolled: DataFrame) -> DataFrame:
    """The golden orders-with-profit projection over the fused
    rollup+join output (reference money rounding on the amount)."""
    return rolled.select(
        "order_id",
        "order_datetime",
        "customer_id",
        _ROUND2(F.col("amount_raw")).alias("total_amount"),
        "num_items",
        "order_profit",
    )


def run_pipeline_tablelog(
    spark: SparkSession,
    transaction_paths: list[str],
    products: DataFrame,
    workdir: str,
    *,
    n_buckets: int = 16,
) -> dict[str, DataFrame]:
    """The five reference outputs with table-log stage boundaries.

    Stage 1 writes line items (plus the precomputed ``profit_term``,
    so the rollup is a pure stored-column aggregate) and the
    deduplicated headers as two tables bucketed on ``order_id`` with
    one committed spec. Stage 2 is the fused SPJ: per-order amount /
    item-count / profit aggregate to completion inside each bucket
    task and join that bucket's headers locally — orders whose items
    were all null-qty vanish exactly as in the reference (inner join).
    Stage 3 appends the orders relation as its own versioned table and
    derives daily summary + forecast from the committed snapshot."""
    li_dir = os.path.join(workdir, "line_items_tl")
    hdr_dir = os.path.join(workdir, "headers_tl")
    orders_dir = os.path.join(workdir, "orders_tl")

    # two write jobs consume txns (line items + headers): cached, the
    # multiLine JSON parse happens once — same rule as run_pipeline
    txns = load_daily_transactions(spark, transaction_paths).transform(
        tracked_cache
    )
    write_bucketed(
        line_items_with_profit_term(build_line_items(txns, products)),
        li_dir,
        key_col="order_id",
        n_buckets=n_buckets,
    )
    write_bucketed(
        dedup_headers(txns),
        hdr_dir,
        key_col="order_id",
        n_buckets=n_buckets,
    )

    rolled = colocated_aggregate_join(
        spark, li_dir, hdr_dir, aggs=FUSED_ORDER_AGGS
    )
    # overwrite, not append: a re-run with the same workdir must
    # REPLACE the orders relation (append would silently double every
    # order in three outputs) — version 0 stays readable for time
    # travel either way
    tl.overwrite(fused_orders_select(rolled), orders_dir)

    orders_full = tl.read_snapshot(spark, orders_dir)
    line_items = tl.read_snapshot(spark, li_dir)
    daily = build_daily_summary(orders_full)
    return {
        "order_line_items": line_items.select(
            "order_id", "product_id", "quantity", "unit_price", "line_total"
        ).orderBy("order_id", "product_id"),
        "products_updated": build_products_updated(line_items, products),
        "orders": orders_full.drop("order_profit").orderBy("order_id"),
        "daily_summary": daily,
        "sales_profit_forecast": build_forecast(daily),
    }
