"""Dump executed formatted plans into plans/r13/<query>_<tag>.txt
(the round-13 optimization evidence: _before at the round's starting
commit — run from a worktree pinned there with --outdir pointing at
the main repo — and _after at its end).

Usage: python scripts/dump_plans_r13.py <tag> [--outdir DIR]
           [--sf-dir DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the queries whose implementation round 13 touched (or examined with
# a measured disposition) — the default dump set
R13_QUERIES = [
    "bloom_decontaminate_docs",
    "pretraining_pipeline_funnel",
    "curriculum_quality_buckets",
    "token_budget_head_selection_distributed",
    "exact_substring_dup_pairs",
]


def main() -> None:
    from candy_store_etl_spark.caching import release_caches
    from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
    from candy_store_etl_spark.session import build_session

    _ensure_loaded()
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    names = args.queries or [n for n in R13_QUERIES if n in QUERIES]
    os.makedirs(outdir, exist_ok=True)
    spark = build_session("dump-plans-r13", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.catalog.clearCache()
        df = QUERIES[name].fn(spark, args.sf_dir)
        df.collect()  # AQE finalizes (and annotates codegen) on execution
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan.rstrip() + "\n")
        release_caches()
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
