"""Interleaved A/B: storage-partitioned join vs plain shuffle join
over the SAME bucketed table-log pair (round-8 colocated operator).

Modes, identical results (asserted on first rep):
  spj     — colocated_bucket_join: per-bucket Acero merge via
            mapInArrow, the only Exchange moves one metadata row per
            bucket group
  shuffle — read_snapshot both sides + DataFrame join on the key:
            Catalyst's plan (sort-merge or broadcast), both scans
            exchanged as usual

Both run the same downstream rollup (per-mktsegment aggregate), so
the delta isolates the JOIN strategy. Rotated execution order across
repetitions (the only trustworthy micro-comparison on this box).

``--n-buckets N`` (default 16) sizes the layout: more buckets = more
SPJ tasks = more of the 32 cores busy — the crossover vs the shuffle
join moves with it. Non-default bucket counts build their own
content-keyed scratch pair.

Usage: python scripts/ab_colocated.py [sf_dir] [reps] [--n-buckets N]
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


def _ensure_pair_n(spark, sf_dir: str, n_buckets: int) -> tuple[str, str]:
    """A (order_stats, cust_dim) pair bucketed at ``n_buckets``; the
    registered fixture covers 16, other counts build their own
    content-keyed scratch."""
    if n_buckets == 16:
        root = _ensure_colocated_tables(spark, sf_dir)
        return (
            os.path.join(root, "order_stats"),
            os.path.join(root, "cust_dim"),
        )
    import tempfile

    from pyspark.sql import functions as F

    from candy_store_etl_spark.operators.colocated import write_bucketed
    from candy_store_etl_spark.sources.scratch import (
        content_fingerprint,
        ensure_scratch,
    )
    from candy_store_etl_spark.sources.tpch import load_table

    okey = content_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    ckey = content_fingerprint(os.path.join(sf_dir, "customer.parquet"))
    root = os.path.join(
        tempfile.gettempdir(), f"csetl_coloc_{okey}_{ckey}_n{n_buckets}"
    )

    def _intact(d: str) -> bool:
        for n in ("order_stats", "cust_dim"):
            t = os.path.join(d, n)
            if tl.current_version(t) != 0:
                return False
            if not all(os.path.exists(p) for p in tl.snapshot_files(t)):
                return False
        return True

    def _build(stage: str) -> None:
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        stats = orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("spend_cents"),
        )
        dim = cust.select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        write_bucketed(
            stats, os.path.join(stage, "order_stats"),
            key_col="cust_key", n_buckets=n_buckets,
        )
        write_bucketed(
            dim, os.path.join(stage, "cust_dim"),
            key_col="cust_key", n_buckets=n_buckets,
        )

    ensure_scratch(root, _build, _intact)
    return os.path.join(root, "order_stats"), os.path.join(root, "cust_dim")


def main() -> None:
    args = list(sys.argv[1:])
    n_buckets = 16
    if "--n-buckets" in args:
        i = args.index("--n-buckets")
        n_buckets = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 3
    spark = build_session("ab-colocated", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    left, right = _ensure_pair_n(spark, sf_dir, n_buckets)

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
                "n_buckets": n_buckets,
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
