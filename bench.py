"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is fully materialized via the noop sink (no driver collect,
no count() shortcut skipping projection work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from candy_store_etl_spark.plans import query_map  # noqa: E402
from candy_store_etl_spark.session import build_session  # noqa: E402

HEADLINE = [
    "daily_summary",
    "pricing_summary",
    "order_rollup",
    "brand_revenue",
    "region_revenue",
    "top_orders_per_customer",
    "hourly_event_stats",
    "event_type_pivot",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("candy-store-etl-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_map()
    names = [n for n in HEADLINE if n in fns]

    # JVM/codegen warm-up on the smallest SF so measured times reflect
    # steady-state execution, not first-query classloading.
    fns[names[0]](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
