"""Warehouse-layout queries: SCD2 history construction and Z-order
clustering keys. Both are pure built-in expressions with DuckDB
oracles.

These are the data-layout half of the 100 TB story: SCD2 turns an
event log into a versioned dimension (the merge pattern every
warehouse runs nightly), and Z-order keys cluster a fact table so
min/max zone maps prune multi-dimensional predicates — the layout
trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed as plain
columnar bit math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import SQL_FROUND, fround
from ..sources.tpch import load_table
from .registry import register


@register(
    "price_history_scd2",
    oracle="""
    WITH daily AS (
      SELECT l.l_partkey AS partkey, o.o_orderdate AS obs_date,
             MIN(l.l_extendedprice) AS price
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_partkey % 50 = 0
      GROUP BY 1, 2
    ),
    flagged AS (
      SELECT partkey, obs_date, price,
             CASE WHEN price = lag(price) OVER w THEN 0 ELSE 1 END AS chg
      FROM daily WINDOW w AS (PARTITION BY partkey ORDER BY obs_date)
    ),
    islands AS (
      SELECT partkey, obs_date, price,
             SUM(chg) OVER (PARTITION BY partkey ORDER BY obs_date
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ),
    versions AS (
      SELECT partkey, CAST(version AS BIGINT) AS version, price,
             MIN(obs_date) AS effective_from,
             COUNT(*) AS n_observations
      FROM islands GROUP BY partkey, version, price
    )
    SELECT partkey, version, price, effective_from,
           lead(effective_from) OVER (PARTITION BY partkey ORDER BY version)
             AS effective_to,
           CAST(n_observations AS BIGINT) AS n_observations,
           CAST(lead(effective_from) OVER (PARTITION BY partkey ORDER BY version)
                IS NULL AS BOOLEAN) AS is_current
    FROM versions
    """,
    doc="SCD2 dimension construction from an observation log "
    "(gaps-and-islands): per-part daily min price, consecutive equal "
    "prices collapsed into versions via lag-flag + running sum, "
    "effective_from/effective_to ranges from lead(). One shuffle on "
    "partkey serves every window; the part filter keeps the oracle "
    "inspectable (drop it at scale — the plan is key-partitioned "
    "either way).",
    tags=("window", "scd2", "warehouse"),
)
def price_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("o_orderdate").alias("obs_date"),
        )
        .agg(F.min("l_extendedprice").alias("price"))
    )
    w = Window.partitionBy("partkey").orderBy("obs_date")
    flagged = daily.select(
        "partkey",
        "obs_date",
        "price",
        F.when(F.col("price") == F.lag("price").over(w), 0).otherwise(1).alias("chg"),
    )
    islands = flagged.select(
        "partkey",
        "obs_date",
        "price",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("version"),
    )
    versions = islands.groupBy(
        "partkey", F.col("version").cast("long").alias("version"), "price"
    ).agg(
        F.min("obs_date").alias("effective_from"),
        F.count("*").cast("long").alias("n_observations"),
    )
    wv = Window.partitionBy("partkey").orderBy("version")
    lead_from = F.lead("effective_from").over(wv)
    return versions.select(
        "partkey",
        "version",
        "price",
        "effective_from",
        lead_from.alias("effective_to"),
        "n_observations",
        lead_from.isNull().alias("is_current"),
    )


def _interleave_expr(a: str, b: str, bits: int = 16) -> str:
    """Shared Spark-SQL/DuckDB expression interleaving the low ``bits``
    of ``a`` (even positions) and ``b`` (odd positions) into a Z-value.
    Both engines parse the identical unrolled bit-op string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


# ten bits per dimension: both keys are uniform over a 1024-value
# range at every SF, so the curve interleaves dimensions of equal
# weight (interleaving a 16-bit with a 7-bit key would just sort by
# the wide key's high bits)
_Z_EXPR = _interleave_expr("(l_partkey % 1024)", "(l_orderkey % 1024)", bits=10)


@register(
    "zorder_layout_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(l_partkey % 1024 AS BIGINT) AS pk10,
           CAST(l_orderkey % 1024 AS BIGINT) AS ok10,
           CAST({_Z_EXPR} AS BIGINT) AS zkey
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="Z-order clustering key: bit-interleave of two 10-bit key "
    "projections — sort/repartitionByRange on zkey before writing and "
    "min/max zone maps prune BOTH dimensions (the OPTIMIZE ZORDER "
    "layout pass, as one codegen projection; locality win quantified "
    "in tests/test_plans.py). The orderkey filter only sizes the "
    "oracle.",
    tags=("warehouse", "layout"),
)
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 1024).cast("long").alias("pk10"),
        (F.col("l_orderkey") % 1024).cast("long").alias("ok10"),
        F.expr(_Z_EXPR).cast("long").alias("zkey"),
    )


@register(
    "approx_price_quantiles",
    # Like approx_distinct_users: the raw sketch output is
    # engine-specific, so the oracle pins the exact interpolated
    # quantiles plus the PROPERTY that Spark's approx_percentile landed
    # within the widened rank band (±0.005 at accuracy 1000 — 5x the
    # guarantee, same spirit as the 5x rsd band on the HLL check).
    oracle=f"""
    SELECT l_returnflag,
           {SQL_FROUND("quantile_cont(l_extendedprice, 0.5)", 4)} AS exact_p50,
           {SQL_FROUND("quantile_cont(l_extendedprice, 0.95)", 4)} AS exact_p95,
           TRUE AS p50_in_band, TRUE AS p95_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (Greenwald-Khanna-style mergeable quantile "
    "sketch, accuracy 1000) next to the exact interpolated quantile — "
    "the 100 TB quantile path: bounded memory per group, one pass, "
    "partial sketches merged across partitions. Property-oracled: the "
    "estimate must sit between the exact quantiles at q∓0.005.",
    tags=("agg", "approx", "sketch"),
)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 1000)").alias("a95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
        F.expr("percentile(l_extendedprice, 0.495)").alias("lo50"),
        F.expr("percentile(l_extendedprice, 0.505)").alias("hi50"),
        F.expr("percentile(l_extendedprice, 0.945)").alias("lo95"),
        F.expr("percentile(l_extendedprice, 0.955)").alias("hi95"),
    )
    return agg.select(
        "l_returnflag",
        fround(F.col("e50"), 4).alias("exact_p50"),
        fround(F.col("e95"), 4).alias("exact_p95"),
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias(
            "p50_in_band"
        ),
        ((F.col("a95") >= F.col("lo95")) & (F.col("a95") <= F.col("hi95"))).alias(
            "p95_in_band"
        ),
    )
_PAGERANK_ORACLE = """
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
      WHERE a.l_orderkey % 20 = 0
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1000000000000 // n AS BIGINT) AS r
           FROM nodes, nn),
    r1 AS (
      SELECT nodes.node,
             CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nn)
                  + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst, SUM(r.r // d.deg) AS s
        FROM r0 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON nodes.node = s.dst),
    r2 AS (
      SELECT nodes.node,
             CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nn)
                  + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst, SUM(r.r // d.deg) AS s
        FROM r1 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON nodes.node = s.dst),
    r3 AS (
      SELECT nodes.node,
             CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nn)
                  + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst, SUM(r.r // d.deg) AS s
        FROM r2 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON nodes.node = s.dst),
    r4 AS (
      SELECT nodes.node,
             CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nn)
                  + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst, SUM(r.r // d.deg) AS s
        FROM r3 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON nodes.node = s.dst),
    r5 AS (
      SELECT nodes.node,
             CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nn)
                  + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst, SUM(r.r // d.deg) AS s
        FROM r4 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON nodes.node = s.dst)
    SELECT node AS suppkey, r AS rank_micro FROM r5
"""

@register(
    "supplier_pagerank",
    oracle=_PAGERANK_ORACLE,
    doc="PageRank over the supplier co-occurrence graph (suppliers "
    "sharing an order are linked), 5 Pregel-shaped rounds in exact "
    "integer micro-units (operators/graph.py::pagerank_integer) — "
    "iterative distributed graph analytics with a bit-identical "
    "DuckDB oracle (the 5 rounds unrolled as chained CTEs). Edges + "
    "degrees are computed once and cached; each round shuffles only "
    "the (node, long) rank relation on dst. The orderkey filter "
    "sizes the oracle.",
    tags=("graph", "iterative"),
)
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_integer

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    pr = pagerank_integer(edges, iterations=5)
    return pr.select(F.col("node").alias("suppkey"), "rank_micro")


@register(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
    doc="Correlated LATERAL subquery with per-row ORDER BY + LIMIT "
    "(top-2 orders per customer) — the same SQL text runs on both "
    "engines. Catalyst decorrelates it into a ranked window join "
    "rather than executing per-row (DecorrelateInnerQuery), so the "
    "lateral form costs the same as the explicit window top-k "
    "(top_orders_per_customer) while reading as point lookups.",
    tags=("sql", "lateral", "join"),
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@register(
    "null_safe_user_join",
    # the driver-generated events table has no NULL user_ids, so the
    # anonymized relation nullifies a deterministic slice (user_id % 50
    # = 0) identically in both engines — the null-safe semantics are
    # then exercised on guaranteed-nonempty NULL groups
    oracle="""
    WITH anon AS (
      SELECT event_id, event_type,
             CASE WHEN user_id % 50 = 0 THEN NULL ELSE user_id END AS uid
      FROM events
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM anon a JOIN anon b
      ON a.uid IS NOT DISTINCT FROM b.uid
     AND a.event_type = 'signup' AND b.event_type = 'error'
     AND a.event_id < b.event_id
    WHERE a.uid IS NULL
    """,
    doc="Null-safe equi-join (Spark <=> / SQL IS NOT DISTINCT FROM) "
    "over an anonymized user column: NULL-user events pair with each "
    "other instead of vanishing as they would under plain =. "
    "Restricted to the NULL partition to keep the oracle small; the "
    "operator point is the join condition's planner support "
    "(null-safe hash join, not a cartesian fallback).",
    tags=("join", "nulls"),
)
def null_safe_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("user_id") % 50 == 0, None)
        .otherwise(F.col("user_id"))
        .alias("uid"),
    )
    a = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("id_a"), F.col("uid").alias("u_a")
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id_b"), F.col("uid").alias("u_b")
    )
    return (
        a.join(b, a.u_a.eqNullSafe(b.u_b) & (a.id_a < b.id_b))
        .filter(F.col("u_a").isNull())
        .select("id_a", "id_b")
    )


@register(
    "data_quality_audit",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY o_orderkey
              HAVING COUNT(*) > 1)) AS BIGINT) AS violations
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_order_fk',
           CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT)
    UNION ALL
    SELECT 'event_type_accepted',
           CAST((SELECT COUNT(*) FROM events
                 WHERE event_type NOT IN
                   ('view','click','purchase','signup','error')
                    OR event_type IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'doc_nchars_consistent',
           CAST((SELECT COUNT(*) FROM documents
                 WHERE NOT (n_chars = length(text))) AS BIGINT)
    """,
    doc="Constraint audit over the warehouse (dbt-test/Deequ pattern): "
    "primary-key uniqueness, NOT NULL, referential integrity "
    "(anti-join), accepted values, and a row-level expression check — "
    "each one declarative scan/aggregate from "
    "candy_store_etl_spark.quality. All-zero violations is the "
    "assertion; a regression in any generator or ingest path flips a "
    "count and fails the hash check.",
    tags=("quality", "audit"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality import (
        check_accepted_values,
        check_expression,
        check_foreign_key,
        check_not_null,
        check_unique,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def count_row(name: str, violations: DataFrame) -> DataFrame:
        # a global aggregate always emits exactly one row (0 for empty)
        return violations.agg(
            F.count(F.lit(1)).cast("long").alias("violations")
        ).select(F.lit(name).alias("check_name"), "violations")

    checks = [
        count_row("orders_pk_unique", check_unique(orders, ["o_orderkey"])),
        count_row("orders_custkey_not_null", check_not_null(orders, ["o_custkey"])),
        count_row(
            "lineitem_order_fk",
            check_foreign_key(lineitem, "l_orderkey", orders, "o_orderkey"),
        ),
        count_row(
            "event_type_accepted",
            check_accepted_values(
                events, "event_type",
                ["view", "click", "purchase", "signup", "error"],
            ),
        ),
        count_row(
            "doc_nchars_consistent",
            check_expression(documents, "n_chars = length(text)"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "monthly_cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month
      FROM orders
    ),
    cohort AS (
      SELECT o_custkey, MIN(month) AS cohort_month FROM activity GROUP BY 1
    )
    SELECT c.cohort_month,
           CAST((year(a.month) * 12 + month(a.month))
                - (year(c.cohort_month) * 12 + month(c.cohort_month))
             AS BIGINT) AS month_offset,
           CAST(COUNT(DISTINCT a.o_custkey) AS BIGINT) AS n_customers
    FROM activity a JOIN cohort c ON a.o_custkey = c.o_custkey
    GROUP BY 1, 2
    """,
    doc="Monthly cohort retention: customers bucketed by first-order "
    "month, activity counted at integer month offsets (exact "
    "year*12+month arithmetic — months_between's fractional days are "
    "engine-noise). Two shuffles on custkey (distinct activity + "
    "cohort min), then one grouped count; the cohort relation is "
    "customer-sized and broadcast.",
    tags=("agg", "cohort", "warehouse"),
)
def monthly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    activity = orders.select(
        "o_custkey", F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("month")
    ).distinct()
    cohort = activity.groupBy("o_custkey").agg(F.min("month").alias("cohort_month"))
    midx = F.year("month") * 12 + F.month("month")
    cidx = F.year("cohort_month") * 12 + F.month("cohort_month")
    return (
        activity.join(F.broadcast(cohort), "o_custkey")
        .groupBy(
            "cohort_month", (midx - cidx).cast("long").alias("month_offset")
        )
        .agg(F.count_distinct("o_custkey").cast("long").alias("n_customers"))
    )


@register(
    "grouped_topk_agg",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM ranked WHERE rn <= 3
    """,
    doc="Top-3 orders per customer WITHOUT a window: "
    "slice(array_sort(collect_list(struct))) inside one hash "
    "aggregate. The window form sorts every partition's full data; "
    "this form's map-side partial aggregation caps state at k rows "
    "per key per task BEFORE the shuffle — the shape that survives a "
    "key whose group would not fit in one task's sort. Oracle is the "
    "window formulation: both define the same total order "
    "(price DESC, orderkey).",
    tags=("agg", "topk"),
)
def grouped_topk_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # struct sorts lexicographically: (-price, orderkey) ascending ==
    # (price DESC, orderkey ASC)
    item = F.struct(
        (-F.col("o_totalprice")).alias("neg_price"),
        F.col("o_orderkey").alias("o_orderkey"),
    )
    top3 = F.slice(F.array_sort(F.collect_list(item)), 1, 3)
    return (
        orders.groupBy("o_custkey")
        .agg(top3.alias("top"))
        .select("o_custkey", F.explode("top").alias("t"))
        .select(
            "o_custkey",
            F.col("t.o_orderkey").alias("o_orderkey"),
            (-F.col("t.neg_price")).alias("o_totalprice"),
        )
    )


@register(
    "snapshot_diff_cdc",
    # deterministic synthetic snapshots from one table: "old" misses
    # every 10th key (-> inserts), "new" reprices every 7th (-> updates),
    # "new" misses every 13th (-> deletes); identical in both engines
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS price FROM orders
      WHERE o_orderkey % 10 != 0
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 13 != 0
    )
    SELECT COALESCE(old.k, new.k) AS k,
           CASE WHEN old.k IS NULL THEN 'insert'
                WHEN new.k IS NULL THEN 'delete'
                ELSE 'update' END AS change
    FROM old FULL OUTER JOIN new ON old.k = new.k
    WHERE old.k IS NULL OR new.k IS NULL OR old.price != new.price
    """,
    doc="Snapshot-diff change-data capture: full outer join of two "
    "keyed snapshots classified into insert/update/delete — the merge "
    "input SCD2 consumes when no change log exists. One co-partitioned "
    "shuffle join; unchanged rows (the bulk at 100 TB) are filtered "
    "before any downstream work.",
    tags=("join", "cdc", "warehouse"),
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("p_old")
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("p_new"),
    )
    joined = old.join(new, old.k_old == new.k_new, "full_outer")
    change = (
        F.when(F.col("k_old").isNull(), "insert")
        .when(F.col("k_new").isNull(), "delete")
        .otherwise("update")
    )
    return (
        joined.filter(
            F.col("k_old").isNull()
            | F.col("k_new").isNull()
            | (F.col("p_old") != F.col("p_new"))
        )
        .select(
            F.coalesce("k_old", "k_new").alias("k"), change.alias("change")
        )
    )


@register(
    "priority_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev_priority
      FROM orders
    )
    SELECT prev_priority, o_orderpriority AS next_priority,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_priority IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Markov transition counting over each customer's order "
    "sequence (lag over a pinned total order, then one grouped "
    "count) — the sequence-analytics shape behind churn models and "
    "behavioral cohorts. One shuffle on custkey for the window, one "
    "tiny aggregate.",
    tags=("window", "sequence"),
)
def priority_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev_priority"),
    )
    return (
        seq.filter(F.col("prev_priority").isNotNull())
        .groupBy("prev_priority", F.col("o_orderpriority").alias("next_priority"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


@register(
    "suppliers_covering_brand",
    oracle="""
    WITH brand AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#11' AND p_size > 45
    ),
    supplied AS (
      SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM brand)
    )
    SELECT l_suppkey AS suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_brand_parts_supplied
    FROM supplied
    GROUP BY 1
    HAVING COUNT(*) = (SELECT COUNT(*) FROM brand)
    """,
    doc="Relational division: suppliers who have shipped EVERY part of "
    "a brand (set-containment via count-matching — the classic "
    "'for-all' query SQL has no operator for). The brand part set is "
    "dimension-sized and broadcast into the fact filter; one distinct "
    "+ one grouped count, no correlated per-supplier subquery.",
    tags=("join", "division"),
)
def suppliers_covering_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    brand = part.filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") > 45)
    ).select("p_partkey")
    n_brand = brand.count()
    supplied = (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    return (
        supplied.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_brand_parts_supplied"))
        .filter(F.col("n_brand_parts_supplied") == n_brand)
    )


@register(
    "weekly_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM days d JOIN du a
      ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
    doc="Rolling 7-day distinct users (WAU): windows cannot express "
    "DISTINCT over a moving frame, and a spine range-join plans as a "
    "nested loop — instead each (day, user) row is EXPLODED to the "
    "<=7 target days it contributes to, turning the rolling window "
    "into plain equi-joins and one distinct count (the activity "
    "relation is day-level, so the 7x fan-out is tiny next to the "
    "fact table it was reduced from). The oracle is the independent "
    "range-join formulation. At 100 TB the same query runs on HLL "
    "sketches merged across the 7 days; this is the exact form.",
    tags=("agg", "window", "distinct"),
)
def weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.lit(6)), lambda i: F.date_add("day", i))
        ).alias("day"),
    )
    # target days past the data's edge have no spine row — the
    # broadcast semi-join drops them
    return (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )


_FUZZY_QUERY = "smal ringg"  # typo'd "small ring" — the fuzzy-match case


@register(
    "fuzzy_part_name_match",
    oracle=f"""
    WITH grams AS (
      SELECT p_partkey, p_name,
             list_distinct(list_transform(
               generate_series(1, length(p_name) - 2),
               i -> substr(p_name, i, 3))) AS g
      FROM part
    ),
    q AS (
      SELECT list_distinct(list_transform(
               generate_series(1, length('{_FUZZY_QUERY}') - 2),
               i -> substr('{_FUZZY_QUERY}', i, 3))) AS qg
    )
    SELECT p_partkey, p_name,
           CAST(len(list_intersect(g, qg)) AS DOUBLE)
             / (len(g) + len(qg) - len(list_intersect(g, qg)))
             AS trigram_sim
    FROM grams, q
    WHERE CAST(len(list_intersect(g, qg)) AS DOUBLE)
            / (len(g) + len(qg) - len(list_intersect(g, qg))) >= 0.3
    """,
    doc="Fuzzy string search via character-trigram Jaccard (the "
    "pg_trgm pattern): one codegen projection computes each name's "
    "trigram set and its overlap with the broadcast query's set — "
    "similarity is an exact integer-set ratio, no float noise. At "
    "100 TB the same trigram sets feed an inverted (gram -> id) "
    "index so candidates are a semi-join, not a full scan; this is "
    "the scan form.",
    tags=("text", "fuzzy"),
)
def fuzzy_part_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")

    def grams(col: F.Column) -> F.Column:
        # Guard < 3 chars: Spark's sequence(1, length-2) would count
        # DOWN (e.g. [1, 0, -1]) where DuckDB's generate_series yields
        # empty — return the empty set explicitly on both engines.
        return F.when(F.length(col) < 3, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(col) - 2),
                    lambda i: F.substring(col, i, 3),
                )
            )
        )

    staged = part.select(
        "p_partkey", "p_name", grams(F.col("p_name")).alias("g")
    ).withColumn("qg", grams(F.lit(_FUZZY_QUERY)))
    inter = F.size(F.array_intersect("g", "qg"))
    sim = inter.cast("double") / (F.size("g") + F.size("qg") - inter)
    return (
        staged.select("p_partkey", "p_name", sim.alias("trigram_sim"))
        .filter(F.col("trigram_sim") >= 0.3)
    )


@register(
    "doc_length_histogram",
    oracle="""
    WITH tok AS (
      SELECT len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x != '')) AS n
      FROM documents
    )
    SELECT CAST(LEAST(n // 8, 9) AS BIGINT) AS bucket,
           CAST(LEAST(n // 8, 9) * 8 AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM tok GROUP BY 1, 2
    """,
    doc="Equi-width histogram of document token counts (8-token "
    "buckets, top bucket open-ended) — the length-distribution "
    "profile every curation run starts from. Pure integer bucket "
    "arithmetic, one grouped count.",
    tags=("text", "histogram"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        F.size(tokens(F.col("text"))).alias("n")
    )
    bucket = F.least(F.floor(F.col("n") / 8), F.lit(9)).cast("long")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select("bucket", (F.col("bucket") * 8).cast("long").alias("bucket_lo"), "n_docs")
    )


@register(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                      AS BIGINT)) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT nation,
           CAST(cents / 100.0 AS DOUBLE) AS revenue,
           CAST(CAST(cents AS HUGEINT) * 1000000
             // (SELECT SUM(cents) FROM rev) AS BIGINT) AS share_ppm
    FROM rev
    """,
    doc="Revenue share per nation in exact parts-per-million: money "
    "accumulates as integer cents (per-row FLOOR cast to integer so "
    "both engines sum integers, exact past 2^53), the share is one "
    "integer division against the grand total — no float ratio can "
    "drift between engines or partitionings; the ppm multiply is "
    "widened (decimal / HUGEINT) so it cannot overflow long until "
    "total revenue passes ~9e16 dollars. Fact joins dims via "
    "broadcast; one shuffle for the grouped sum, the total is a "
    "scalar subquery (driver-size).",
    tags=("agg", "join", "money"),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("long")
            ).alias("cents")
        )
    )
    total = rev.agg(F.sum("cents").alias("total_cents"))
    return rev.crossJoin(F.broadcast(total)).select(
        "nation",
        (F.col("cents") / 100.0).cast("double").alias("revenue"),
        F.expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div total_cents")
        .cast("long")
        .alias("share_ppm"),
    )
