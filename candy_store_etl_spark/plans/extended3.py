"""Coverage batch 5: ranking-distribution window functions,
statistical aggregates, and collection aggregates — each with a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register
from .relational import SQL_FROUND, fround


# ---------------------------------------------------------------------------
# Ranking distributions: ntile / percent_rank / cume_dist.
# ---------------------------------------------------------------------------
@register(
    "order_value_distribution",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           {SQL_FROUND("percent_rank() OVER w", 6)} AS pct_rank,
           {SQL_FROUND("cume_dist() OVER w", 6)} AS cume
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Ranking-distribution windows (ntile/percent_rank/cume_dist) "
    "with a total order (price, key) so ranks are deterministic.",
    tags=("window", "ranking"),
)
def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        fround(F.percent_rank().over(w), 6).alias("pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: stddev / variance / correlation. These are
# genuinely float-order-sensitive, so results agree to ~1e-12 relative
# (both engines use stable single-pass estimators) and the check rides
# the gate's 1e-9 closeness rather than exact equality — rounded to
# 6 dp here to keep string hashes stable too.
# ---------------------------------------------------------------------------
@register(
    "brand_price_stats",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           {SQL_FROUND("stddev_samp(p_retailprice)", 6)} AS price_sd,
           {SQL_FROUND("var_samp(p_retailprice)", 6)} AS price_var,
           {SQL_FROUND("corr(p_retailprice, p_size)", 6)} AS price_size_corr
    FROM part GROUP BY p_brand
    """,
    doc="Statistical aggregate family (sample stddev/variance, "
    "Pearson correlation) per group — one pass, partial+final.",
    tags=("agg", "stats"),
)
def brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        fround(F.stddev_samp("p_retailprice"), 6).alias("price_sd"),
        fround(F.var_samp("p_retailprice"), 6).alias("price_var"),
        fround(F.corr("p_retailprice", "p_size"), 6).alias("price_size_corr"),
    )


# ---------------------------------------------------------------------------
# Collection aggregates: collect_set → sorted array, and the string
# aggregation form. Sorting makes the nondeterministic collection
# order canonical — the only way collection aggs can be oracle-checked.
# ---------------------------------------------------------------------------
@register(
    "nation_order_years",
    oracle="""
    WITH cust_year AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(year(o.o_orderdate) AS INTEGER) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT nationkey,
           list_sort(list(DISTINCT y)) AS years,
           array_to_string(list_sort(list(DISTINCT y)), ',') AS years_csv,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM cust_year GROUP BY nationkey
    """,
    doc="Collection aggregates — collect_set canonicalized with "
    "array_sort (collection order is otherwise nondeterministic), "
    "plus the string_agg form via concat_ws.",
    tags=("agg", "collect"),
)
def nation_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    years = F.array_sort(F.collect_set(F.year("o_orderdate")))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            years.alias("years"),
            F.concat_ws(",", years).alias("years_csv"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
