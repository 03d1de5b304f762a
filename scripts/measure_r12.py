"""Round-12 optimization diagnostics: per-headline-query split of
plan-CONSTRUCTION time (the query function call — eager metadata
resolves, scratch intact-checks, probe hashing) vs EXECUTION time (the
noop-sink write), plus the number of Spark jobs each phase launches.

A query whose build phase launches many jobs or dominates its wall time
is paying fixed driver/metadata overhead, not data-proportional compute
— the round-12 optimization target the bench's single number hides.

Usage: python scripts/measure_r12.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    from candy_store_etl_spark.caching import release_caches
    from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
    from candy_store_etl_spark.session import build_session

    _ensure_loaded()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [n for n in HEADLINE if n in QUERIES]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("measure-r12", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def job_high_water() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    # warm-up (worker fork, codegen, scratch builds) at the smallest SF
    for name in names:
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        release_caches()
    spark.catalog.clearCache()

    rows = []
    for name in names:
        best = None
        for _ in range(3):
            release_caches()
            spark.catalog.clearCache()
            j0 = job_high_water()
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = job_high_water()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = job_high_water()
            sample = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "build_jobs": j1 - j0,
                "exec_jobs": j2 - j1,
            }
            if best is None or sample["total_s"] < best["total_s"]:
                best = sample
        rows.append({"query": name, **best})
        print(json.dumps(rows[-1]))
    print(
        json.dumps(
            {
                "total_s": round(sum(r["total_s"] for r in rows), 3),
                "build_s": round(sum(r["build_s"] for r in rows), 3),
                "jobs": sum(r["build_jobs"] + r["exec_jobs"] for r in rows),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
