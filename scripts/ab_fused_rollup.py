"""Interleaved A/B: the FUSED per-bucket rollup+join
(colocated_aggregate_join) vs composing the two existing operators vs
the plain shuffle plan — the measurement behind the fused operator's
"composing would still exchange the intermediate" claim.

Modes, identical results (asserted on first rep):
  fused    — colocated_aggregate_join: each bucket task aggregates its
             keys to completion AND joins that bucket's dim group
             locally; the only exchange routes one metadata row per
             group
  composed — bucketed_aggregate (exchange-free rollup) -> write the
             intermediate as a THIRD bucketed table-log table ->
             colocated_bucket_join against the dim: the exact work
             fusion removes (one hash-repartition + one table write +
             one extra task wave per run)
  shuffle  — read_snapshot + groupBy().agg() + join(): Catalyst's
             partial/final aggregate and whatever join it picks

All three run the same downstream per-status fold, so the delta
isolates the rollup+join strategy. Rotated execution order across
repetitions; the composed mode's intermediate table is written to a
fresh tmp dir each rep (that write IS its cost).

Usage: python scripts/ab_fused_rollup.py [sf_dir] [reps] [--n-buckets N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from candy_store_etl_spark.caching import release_caches
from candy_store_etl_spark.operators.colocated import (
    colocated_aggregate_join,
    colocated_bucket_join,
    write_bucketed,
)
from candy_store_etl_spark.session import build_session
from candy_store_etl_spark.sources import table_log as tl
from candy_store_etl_spark.sources.scratch import (
    content_fingerprint,
    ensure_scratch,
)
from candy_store_etl_spark.sources.tpch import load_table

AGGS = [("cents", "sum", "cents"), ("okey", "count", "n_lines")]


def _ensure_tables(spark, sf_dir: str, n_buckets: int) -> tuple[str, str]:
    lkey = content_fingerprint(os.path.join(sf_dir, "lineitem.parquet"))
    okey = content_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    root = os.path.join(
        tempfile.gettempdir(), f"csetl_fused_{lkey}_{okey}_n{n_buckets}"
    )

    def _intact(d: str) -> bool:
        for n in ("lines", "order_dim"):
            t = os.path.join(d, n)
            if tl.current_version(t) != 0:
                return False
            if not all(os.path.exists(p) for p in tl.snapshot_files(t)):
                return False
        return True

    def _build(stage: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("okey"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        write_bucketed(
            li, os.path.join(stage, "lines"),
            key_col="okey", n_buckets=n_buckets,
        )
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("okey"),
                F.col("o_orderstatus").alias("status"),
            ),
            os.path.join(stage, "order_dim"),
            key_col="okey", n_buckets=n_buckets,
        )

    ensure_scratch(root, _build, _intact)
    return os.path.join(root, "lines"), os.path.join(root, "order_dim")


def _fold(df):
    return (
        df.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
            F.sum("n_lines").alias("n_lines"),
        )
        .orderBy("status")
    )


def main() -> None:
    args = list(sys.argv[1:])
    n_buckets = 16
    if "--n-buckets" in args:
        i = args.index("--n-buckets")
        n_buckets = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 3
    spark = build_session("ab-fused-rollup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    lines, dim = _ensure_tables(spark, sf_dir, n_buckets)

    def fused():
        return _fold(colocated_aggregate_join(spark, lines, dim, AGGS))

    scratch_dirs: list[str] = []

    def composed():
        from candy_store_etl_spark.operators.colocated import (
            bucketed_aggregate,
        )

        inter = tempfile.mkdtemp(prefix="ab_fused_inter_")
        scratch_dirs.append(inter)
        rolled = bucketed_aggregate(spark, lines, AGGS)
        mid = os.path.join(inter, "rollup")
        write_bucketed(rolled, mid, key_col="okey", n_buckets=n_buckets)
        return _fold(colocated_bucket_join(spark, mid, dim))

    def _cleanup_scratch():
        # OUTSIDE the timed region: charging the previous rep's
        # rmtree to the composed measurement would bias it
        while scratch_dirs:
            shutil.rmtree(scratch_dirs.pop(), ignore_errors=True)

    def shuffle():
        rolled = (
            tl.read_snapshot(spark, lines)
            .groupBy("okey")
            .agg(
                F.sum("cents").alias("cents"),
                F.count("okey").alias("n_lines"),
            )
        )
        return _fold(rolled.join(tl.read_snapshot(spark, dim), "okey"))

    modes = {"fused": fused, "composed": composed, "shuffle": shuffle}
    first = {n: sorted(map(tuple, fn().collect())) for n, fn in modes.items()}
    assert first["fused"] == first["composed"] == first["shuffle"], (
        "modes disagree"
    )

    _cleanup_scratch()  # the correctness check's intermediate
    times: dict[str, list[float]] = {n: [] for n in modes}
    order = list(modes)
    for _rep in range(reps):
        for n in order:
            release_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            modes[n]().write.format("noop").mode("overwrite").save()
            times[n].append(round(time.perf_counter() - t0, 3))
            _cleanup_scratch()
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
                "fused_vs_composed_pct": round(
                    100.0 * (best["fused"] - best["composed"])
                    / best["composed"],
                    1,
                ),
                "fused_vs_shuffle_pct": round(
                    100.0 * (best["fused"] - best["shuffle"])
                    / best["shuffle"],
                    1,
                ),
                "ambient_load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
