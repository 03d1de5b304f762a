"""Marginal-day maintenance cost of the incremental candy pipeline.

The IVM claim (`plans/candy_colocated.run_pipeline_incremental`) is
that ingesting day N costs what ingesting day 10 did — maintenance at
every hop is proportional to the DAY'S delta, never to accumulated
history. This script measures exactly that marginal cost: for each
day-scaled dataset (10 / 100 / 1000 distinct days,
`scripts/gen_candy_scale.py`), seed the maintained tables with all
but the last K days in ONE multi-day increment (allocation order is
preserved by load_daily_transactions' day_idx), then time K
single-day ingests on top of the full history. A flat s/day across
the three history sizes is the claim, measured.

Methodology matches scaling_curve.py: wait for a quiet box, one
untimed warm ingest before the timed ones (cold JVM/page-cache
measured 2-5x steady state there), report the min and all samples.

Writes/replaces the "## IVM marginal-day maintenance" section of
SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
sys.path.insert(0, os.path.dirname(__file__))

from candy_store_etl_spark.caching import release_caches  # noqa: E402
from candy_store_etl_spark.session import build_session  # noqa: E402

DATASETS = [
    ("10", "/root/reference/data/dataset_5"),
    ("100", "/root/repo/.scale/candy_sf1"),
    ("1000", "/root/repo/.scale/candy_sf10"),
]

HEADER = "## IVM marginal-day maintenance"


def measure(spark, data_dir: str, timed_days: int) -> dict:
    from candy_store_etl_spark.plans.candy_colocated import (
        ingest_days,
        read_pipeline_outputs,
    )
    from candy_store_etl_spark.sources.candy import read_products

    products = read_products(
        spark, os.path.join(data_dir, "products.csv")
    )
    paths = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.startswith("transactions_")
    )
    k = timed_days + 1  # +1 untimed warm day
    if len(paths) <= k:
        raise SystemExit(
            f"{data_dir}: {len(paths)} day files cannot seed history "
            f"and still time {timed_days}+1 marginal days"
        )
    workdir = tempfile.mkdtemp(prefix="ivm_marginal_")
    try:
        t0 = time.perf_counter()
        ingest_days(
            spark, paths[:-k], products, workdir, tag="seed-history"
        )
        seed_s = time.perf_counter() - t0
        samples = []
        for i, p in enumerate(paths[-k:]):
            release_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ingest_days(spark, [p], products, workdir)
            dt = time.perf_counter() - t0
            if i > 0:  # first post-seed day is the untimed warm pass
                samples.append(round(dt, 3))
        # sanity: the maintained daily view covers every ingested day
        n_days = read_pipeline_outputs(spark, workdir, products)[
            "daily_summary"
        ].count()
        assert n_days == len(paths), (n_days, len(paths))
        return {
            "history_days": len(paths),
            "seed_seconds": round(seed_s, 2),
            "marginal_day_seconds_min": min(samples),
            "marginal_day_seconds": samples,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timed-days", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    args = ap.parse_args()

    from bench import _wait_for_quiet

    ambient = _wait_for_quiet()
    spark = build_session("ivm-marginal-day", cpus=args.cpus)
    results = {}
    for label, d in DATASETS:
        if not os.path.isdir(d):
            continue
        results[label] = measure(spark, d, args.timed_days)
        print(label, results[label], flush=True)

    md_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(md_path) as f:
        existing = f.read()
    # idempotent, section-scoped replace shared with every other
    # SCALING regenerator (bench.splice_section) — preserves all other
    # sections AND their order
    from bench import splice_section
    lines = [
        f"\n{HEADER}\n",
        "\nThe incremental pipeline's claim, measured: ingest ONE new "
        "day on top of H days of maintained history "
        "(`plans/candy_colocated.ingest_days` — bucketed append + "
        "three change-feed-driven CDC merges). Seed = all prior days "
        "in one increment; one untimed warm day precedes the timed "
        f"ones; best of {args.timed_days} timed days reported "
        f"(ambient load {ambient:.2f}).\n",
        "\n| history (days) | marginal day (s, min) | samples (s) | "
        "seed (s) |\n|---|---|---|---|\n",
    ]
    for label, r in results.items():
        lines.append(
            f"| {r['history_days']} | {r['marginal_day_seconds_min']} "
            f"| {', '.join(str(s) for s in r['marginal_day_seconds'])} "
            f"| {r['seed_seconds']} |\n"
        )
    lines.append(
        "\nFlat marginal cost across two decades of history is the "
        "IVM property: the batch pipeline re-reads and re-aggregates "
        "all H days to add one (the reference's per-day driver loop "
        "does too), while the maintained chain pays only the day's "
        "delta at every hop.\n"
    )
    with open(md_path, "w") as f:
        f.write(splice_section(existing, f"\n{HEADER}\n", "".join(lines)))
    print(json.dumps({"metric": "ivm_marginal_day", **results,
                      "ambient_load_1m": round(ambient, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
