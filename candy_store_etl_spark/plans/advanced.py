"""Advanced operators: stateful allocation, sessionization, as-of join,
and regression-based forecasting (SURVEY.md §2.3, §2.8, §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.allocation import allocate_greedy
from ..operators.multimodal import (
    attach_media_column,
    decode_media,
    resize_media,
)
from ..sources.tpch import load_table
from ..timeseries.forecast import forecast_metrics
from .registry import register
from .relational import SQL_FROUND, fround


# ---------------------------------------------------------------------------
# Greedy inventory allocation (reference op 16 — the candy-store heart).
# Non-linear per-product recurrence → not SQL-expressible → rows-only
# check here; exact semantics are pinned by tests/test_allocation.py
# (brute-force sequential simulation + property tests).
# ---------------------------------------------------------------------------
@register(
    "inventory_allocation",
    oracle=None,
    doc="Greedy FCFS stock allocation with cancellation "
    "(data_processor.py:188-262) as groupBy(product).applyInPandas; "
    "deterministic UNIQUE ordering key (orderkey, linenumber, suppkey, "
    "extendedprice); stock = p_size*40.",
    tags=("stateful", "applyInPandas"),
)
def inventory_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_extendedprice",
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").cast("int").alias("qty"),
    )
    stock = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"),
        (F.col("p_size") * 40).alias("stock"),
    )
    return allocate_greedy(
        li,
        stock,
        order_by=("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"),
    )


@register(
    "inventory_allocation_chained",
    oracle=None,
    doc="Hot-key form of the allocation: items pre-split into order-"
    "contiguous chunks (spillable ntile window), remaining stock "
    "chained between distributed rounds — identical results to the "
    "single pass (tests/test_allocation.py), bounded task memory for "
    "a pathologically hot product.",
    tags=("stateful", "applyInPandas", "skew"),
)
def inventory_allocation_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.allocation import allocate_greedy_chained

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_extendedprice",
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").cast("int").alias("qty"),
    )
    stock = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"),
        (F.col("p_size") * 40).alias("stock"),
    )
    # static 2 so the gate always exercises the chained path; in
    # production use chunks="auto" (sizes rounds from the hottest key)
    return allocate_greedy_chained(
        li,
        stock,
        chunks=2,
        order_by=("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"),
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based sessions over the event stream — the batch
# twin of streaming session windows (SURVEY §2.8 gap).
# ---------------------------------------------------------------------------
_GAP_SECONDS = 1800


@register(
    "user_sessions",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(LAG(ts) OVER w) > {_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min inactivity) via lag + running "
    "sum — deterministic tiebreak on event_id.",
    tags=("window", "sessionize"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > _GAP_SECONDS),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("session_id", F.sum(is_new).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent signup at
# or before it. Spark lacks a native ASOF JOIN; the scalable encoding
# is a union + ordered window (one shuffle, no range explosion).
# DuckDB has native ASOF JOIN → clean oracle.
# ---------------------------------------------------------------------------
@register(
    "purchase_asof_signup",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of (point-in-time) join via tagged union + last(ignoreNulls) "
    "ordered window — the Spark-native encoding of ASOF JOIN.",
    tags=("join", "asof", "window"),
)
def purchase_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        # signups sort before purchases at equal ts → inclusive >= match
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("sig_ts"),
        F.when(F.col("event_type") == "signup", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("signup_ts", F.last("sig_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", F.col("ts").alias("purchase_ts"), "signup_ts"
        )
    )


# The same as-of join through the COGROUPED-MAP surface (one
# pd.merge_asof per user) — same oracle, so both encodings are proven
# equivalent at the gate.
@register(
    "purchase_asof_signup_cogrouped",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join via cogroup().applyInPandas (pd.merge_asof per "
    "user) — the third grouped-pandas surface and the template for "
    "asof variants built-ins can't express (nearest match, tolerance "
    "bands); oracle-identical to the window encoding.",
    tags=("join", "asof", "cogroup"),
)
def purchase_asof_signup_cogrouped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ..operators.asof import asof_join_cogrouped

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_raw")
    )
    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("user_id", LongType(), True),
            StructField("purchase_ts", TimestampType(), True),
            StructField("signup_ts", TimestampType(), True),
        ]
    )
    return asof_join_cogrouped(
        purchases,
        signups,
        key="user_id",
        left_ts="purchase_ts",
        right_ts="signup_raw",
        out_col="signup_ts",
        schema=schema,
    )


# ---------------------------------------------------------------------------
# Forecasting (reference §2.9): per-series linear trend, next-day
# prediction. The reference fits Prophet driver-side on collected NumPy
# arrays (time_series.py:16-43); here the SQL-expressible core (OLS via
# regr_slope/regr_intercept) runs distributed, and the richer seasonal
# model lives in timeseries/forecast.py (applyInPandas, rows-only).
# ---------------------------------------------------------------------------
@register(
    "linear_forecast_daily_value",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
             SUM(FLOOR(value*100 + 0.5))/100.0 AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           {SQL_FROUND("regr_slope(y, x)", 4)} AS slope,
           {SQL_FROUND("regr_intercept(y, x)", 4)} AS intercept,
           {SQL_FROUND("regr_intercept(y, x) + regr_slope(y, x) * (MAX(x) + 1)", 2)}
             AS next_day_forecast
    FROM daily GROUP BY event_type
    """,
    doc="Per-series OLS trend + next-day forecast, fully distributed "
    "(replaces driver-side Prophet collect, data_processor.py:533-547).",
    tags=("timeseries", "agg"),
)
def linear_forecast_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("x"),
    ).agg((F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0).alias("y"))
    return daily.groupBy("event_type").agg(
        fround(F.regr_slope("y", "x"), 4).alias("slope"),
        fround(F.regr_intercept("y", "x"), 4).alias("intercept"),
        fround(
            F.regr_intercept("y", "x") + F.regr_slope("y", "x") * (F.max("x") + 1), 2
        ).alias("next_day_forecast"),
    )


# ---------------------------------------------------------------------------
# Grouped-map seasonal forecaster (reference §2.9 Prophet surface) and
# multimodal decode plumbing — both rows-only (non-SQL-expressible).
# ---------------------------------------------------------------------------
@register(
    "seasonal_forecast_daily_value",
    oracle=None,
    doc="Trend + weekday-seasonal forecast per event_type via "
    "applyInPandas (deterministic Prophet replacement; fits on real "
    "dates, emits in-sample MAE/MSE — time_series.py:16-67 parity).",
    tags=("timeseries", "applyInPandas"),
)
def seasonal_forecast_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("date"), "event_type")
        .agg((F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0).alias("y"))
        .groupBy("date")
        .pivot("event_type")
        .sum("y")
        .na.fill(0.0)
    )
    metric_cols = [c for c in daily.columns if c != "date"]
    return forecast_metrics(
        daily, date_col="date", metric_cols=metric_cols, horizon=3
    )


@register(
    "multimodal_decode_features",
    oracle=None,
    doc="Binary media column -> decoded dims + feature vector via "
    "Arrow-batched mapInPandas (codec stubbed deterministically; "
    "Spark-side schema/batch plumbing real — tests/test_multimodal).",
    tags=("multimodal", "mapInPandas"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_column(docs, "doc_id", "text")
    return decode_media(media, n_features=16)


@register(
    "multimodal_resize",
    oracle=None,
    doc="Media resize as two stages: aspect-preserving geometry planned "
    "JVM-side (scale/target dims/skip flag at scan speed), pixel "
    "resample in the Arrow-batched codec stage (stubbed; contract "
    "pinned in tests/test_multimodal).",
    tags=("multimodal", "mapInPandas", "resize"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_column(docs, "doc_id", "text")
    return resize_media(media, max_side=32)
