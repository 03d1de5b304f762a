"""Round-12 catalog-wide timing sweep: one warm noop-sink execution of
EVERY registered query at a small SF, printed as JSON lines — the
"examined every operator" evidence for the optimization round. Not a
bench (single-shot, small SF); it exists to surface pathological
fixed-overhead queries the headline suite does not contain.

Usage: python scripts/sweep_catalog_r12.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from candy_store_etl_spark.caching import release_caches
    from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
    from candy_store_etl_spark.session import build_session

    _ensure_loaded()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("sweep-r12", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in sorted(QUERIES):
        release_caches()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            out[name] = dt
            print(json.dumps({"q": name, "s": dt}), flush=True)
        except Exception as exc:  # surface, keep sweeping
            print(json.dumps({"q": name, "err": str(exc)[:200]}), flush=True)
    top = sorted(out.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({"total_s": round(sum(out.values()), 1), "top": top}))
    spark.stop()


if __name__ == "__main__":
    main()
