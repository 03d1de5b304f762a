"""ONE A/B session: time a comma-separated list of registered queries
against whichever code tree PYTHONPATH points at, print ONE JSON line
prefixed ``ABRESULT``. Driven by ``ab_pinned_commits.py`` — kept
code-version-agnostic (only the stable query_map/build_session surface)
so the SAME runner file executes inside a worktree pinned to an older
commit.

Usage: python ab_session_runner.py q1,q2,... [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

from candy_store_etl_spark.caching import release_caches
from candy_store_etl_spark.plans import query_map
from candy_store_etl_spark.session import build_session


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # session-conf A/B support (r13 verdict item 9): candidate confs
    # that are NOT runtime-settable (shuffle codec) need a fresh
    # session per side; the rotation driver passes them through the
    # environment as "k=v;k=v"
    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_AB_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = build_session(
        "ab-session",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_map()
    missing = [n for n in names if n not in fns]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    # same discipline as bench.py: warm once at the smallest SF so
    # JVM/codegen/Arrow-worker cold start never lands in a timing
    for n in names:
        fns[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(reps):
            release_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fns[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[n] = round(best, 3)
    print("ABRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
