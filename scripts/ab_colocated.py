"""Interleaved A/B: storage-partitioned join vs plain shuffle join
over the SAME bucketed table-log pair (round-8 colocated operator).

Modes, identical results (asserted on first rep):
  spj     — colocated_bucket_join: per-bucket Arrow/pandas merge, the
            only Exchange moves one metadata row per bucket group
  shuffle — read_snapshot both sides + DataFrame join on the key:
            Catalyst's plan (sort-merge or broadcast), both scans
            exchanged as usual

Both run the same downstream rollup (per-mktsegment aggregate), so
the delta isolates the JOIN strategy. Rotated execution order across
repetitions (the only trustworthy micro-comparison on this box).

Usage: python scripts/ab_colocated.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candy_store_etl_spark.caching import release_caches
from candy_store_etl_spark.operators.colocated import colocated_bucket_join
from candy_store_etl_spark.plans.round8 import (
    _coloc_segment_rollup,
    _ensure_colocated_tables,
)
from candy_store_etl_spark.session import build_session
from candy_store_etl_spark.sources import table_log as tl


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session("ab-colocated", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    root = _ensure_colocated_tables(spark, sf_dir)
    left = os.path.join(root, "order_stats")
    right = os.path.join(root, "cust_dim")

    def spj():
        return _coloc_segment_rollup(
            colocated_bucket_join(spark, left, right)
        )

    def shuffle():
        return _coloc_segment_rollup(
            tl.read_snapshot(spark, left).join(
                tl.read_snapshot(spark, right), "cust_key"
            )
        )

    modes = {"spj": spj, "shuffle": shuffle}
    first = {n: sorted(map(tuple, fn().collect())) for n, fn in modes.items()}
    assert first["spj"] == first["shuffle"], "modes disagree"

    times: dict[str, list[float]] = {n: [] for n in modes}
    order = list(modes)
    for rep in range(reps):
        for n in order:
            release_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            modes[n]().write.format("noop").mode("overwrite").save()
            times[n].append(round(time.perf_counter() - t0, 3))
        order = order[1:] + order[:1]  # rotate

    best = {n: min(ts) for n, ts in times.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "times": times,
                "best": best,
                "spj_vs_shuffle_pct": round(
                    100.0 * (best["spj"] - best["shuffle"]) / best["shuffle"],
                    1,
                ),
                "ambient_load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
