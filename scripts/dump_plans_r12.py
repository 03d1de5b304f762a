"""Dump executed formatted plans for the headline queries into
plans/r12/<query>_<tag>.txt (the round-12 optimization evidence:
_before at the round's starting commit, _after at its end).

Usage: python scripts/dump_plans_r12.py <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402 — the bench suite IS the scope


def main() -> None:
    from candy_store_etl_spark.caching import release_caches
    from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
    from candy_store_etl_spark.session import build_session

    _ensure_loaded()
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or [n for n in HEADLINE if n in QUERIES]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    spark = build_session("dump-plans-r12", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.catalog.clearCache()
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()  # AQE finalizes (and annotates codegen) on execution
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan.rstrip() + "\n")
        release_caches()
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
