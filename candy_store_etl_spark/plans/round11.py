"""Round-11 queries: regime oracles for the two write/join routers
the round-9 verdict asked for — the coverage-routed CDC sink (the
serve() treatment applied to the WRITE path) and the join face of the
serving planner — plus the incrementally-maintained candy pipeline.

Router-oracle design rule (established by the serve() regime rows,
``plans/round10.py``): the fixture pins each regime so far inside its
region that the route is DETERMINISTIC — trickle batches touch
provably fewer files than the crossover fraction at every SF, the
saturating batch touches every live file by construction (its key set
is a superset of every prior batch's) — and the chosen route is
emitted as a hash-checked output column next to exact merged values
the oracle recomputes from the raw relations. A router that picks the
wrong strategy, or a strategy that merges wrong values, fails the
same gate.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table_log as tl
from ..sources.tpch import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Coverage-routed CDC sink: trickle -> partitioned, saturated -> full-rewrite
# ---------------------------------------------------------------------------

_CDC_ROUTER_ORACLE = """
WITH all_rows AS (
  SELECT user_id, value FROM events WHERE event_id % 3 = 0
  UNION ALL SELECT user_id, value FROM events WHERE user_id % 500 = 1
  UNION ALL SELECT user_id, value FROM events
),
tot AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
         CAST(COUNT(*) AS BIGINT) AS total_events,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM all_rows
)
SELECT b.batch_id, b.route, TRUE AS coarsened,
       t.n_keys, t.total_events, t.total_cents
FROM (VALUES (CAST(0 AS BIGINT), 'partitioned'),
             (CAST(1 AS BIGINT), 'partitioned'),
             (CAST(2 AS BIGINT), 'full-rewrite')) b(batch_id, route)
CROSS JOIN tot t
ORDER BY b.batch_id
"""


@register(
    "cdc_routed_sink_regimes",
    oracle=_CDC_ROUTER_ORACLE,
    doc="The coverage-routed CDC sink's regime contract, one row per "
    "applied batch: a seed and a 1-key trickle batch merge "
    "PARTITIONED (rewrite proportional to touched keys — the trickle "
    "touches 1 of 13+ live group files, far under the 0.3 crossover "
    "at every SF), while a saturating batch (every key — its touched "
    "set provably covers all live files, fraction 1.0) FULL-REWRITES "
    "at bulk grouping, coarsening the layout in the same atomic "
    "commit. The route is read back from the COMMITTED log (a "
    "full-rewrite commit records its new grouping in meta), not from "
    "in-memory sink state, and the merged warehouse totals are "
    "recomputed by the oracle from the three raw input slices — a "
    "mis-routed batch or a wrong merge both fail the hash. This "
    "closes SCALING.md's documented manual gap: the saturated-input "
    "measurement showed the partitioned layout LOSING 20x at ~71% "
    "files rewritten; the router now picks the winner per batch from "
    "the exact touched-file count it already collects.",
    tags=("streaming", "cdc", "warehouse", "router", "table-format"),
)
def cdc_routed_sink_regimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.scratch import content_fingerprint, ensure_scratch
    from ..streaming.cdc import make_routed_cdc_sink, read_warehouse

    src = os.path.join(sf_dir, "events.parquet")
    key = content_fingerprint(src, extra="cdc-router-v1")
    root = os.path.join(tempfile.gettempdir(), f"csetl_cdcrt_{key}")
    w = os.path.join(root, "warehouse")

    def _intact(d: str) -> bool:
        t = os.path.join(d, "warehouse")
        if tl.current_version(t) != 2:
            return False
        return all(os.path.exists(p) for p in tl.snapshot_files(t))

    def _build(stage: str) -> None:
        events = load_table(spark, sf_dir, "events")

        def inc(batch_df: DataFrame) -> DataFrame:
            return batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("cents"),
            )

        sink = make_routed_cdc_sink(
            os.path.join(stage, "warehouse"),
            inc,
            key_col="user_id",
            add_cols=("n_events", "cents"),
            n_buckets=64,
            bulk_files=8,
        )
        sink(events.filter(F.col("event_id") % 3 == 0), 0)  # seed
        sink(events.filter(F.col("user_id") % 500 == 1), 1)  # trickle
        sink(events, 2)  # saturating: every key

    ensure_scratch(root, _build, _intact)
    # the route evidence is COMMITTED state: a full-rewrite batch
    # records its new grouping in the commit's meta, so the routes are
    # readable from the log by any later session (and survive the
    # scratch cache, where the sink's in-memory metrics would not)
    routes = []
    for e in tl.log_entries(w):
        if e["op"].startswith("cdc-batch-"):
            bid = int(e["op"].rsplit("-", 1)[1])
            full = "buckets_per_file" in (e.get("meta") or {})
            routes.append((bid, "full-rewrite" if full else "partitioned"))
    route_df = spark.createDataFrame(
        sorted(routes), "batch_id long, route string"
    )
    totals = read_warehouse(spark, w).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_events").alias("total_events"),
        F.sum("cents").alias("total_cents"),
    )
    coarsened = tl.layout_buckets_per_file(w) > 1
    return (
        route_df.crossJoin(totals)
        .withColumn("coarsened", F.lit(coarsened))
        .select(
            "batch_id",
            "route",
            "coarsened",
            "n_keys",
            "total_events",
            "total_cents",
        )
        .orderBy("batch_id")
    )
