"""Interleaved A/B for the heavy-hitter sketch plan (round-6: the
trigram row was the sf10 cost leader at ~53 s; round-7 settled it).

Modes (identical results, asserted):
  cur     — the round-6 production plan: tracked_cache'd explode + 3
            scans (total count, MG candidates, exact verify)
  nocache — same plan, no cache: 3 independent explodes
  fused   — no cache; total count computed WITHOUT exploding (sum of
            per-doc trigram counts — one cheap doc-level aggregate),
            explode only for candidates + exact verify (2 explodes)
  direct  — ROUND-7 PRODUCTION: never materialize occurrences —
            numpy-packed trigram codes + np.unique per Arrow batch
            emit (trigram, partial-count); weighted MG fold + weighted
            exact verify downstream (operators/sketches.py)

Measured sf10 (2 reps, rotated order): cur 50.8 / nocache 44.1 /
fused 38.8 / direct 3.2 s — the direct tier is registered.

Usage: python scripts/ab_hh_trigrams.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from candy_store_etl_spark.caching import release_caches, tracked_cache
from candy_store_etl_spark.operators.dedup import explode_nonempty
from candy_store_etl_spark.operators.sketches import misra_gries_candidates
from candy_store_etl_spark.sources.tpch import load_table, repartition_for_compute

T, K, MAXPOS = 128, 128, 4096


def _tris(spark, sf_dir) -> DataFrame:
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    return explode_nonempty(
        docs.filter(F.length("text") >= 3).select(
            F.expr(
                f"transform(sequence(1, least(length(text) - 2, {MAXPOS})),"
                " i -> substr(text, i, 3))"
            ).alias("ts")
        ),
        "t3",
        F.col("ts"),
    )


def _finish(cached_or_not: DataFrame, cands: DataFrame, total: DataFrame):
    exact = (
        cached_or_not.join(F.broadcast(cands), "t3")
        .groupBy("t3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * T > F.col("__n"))
        .select(
            "t3",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("cnt * CAST(1000000 AS BIGINT) div __n")
            .cast("long")
            .alias("share_ppm"),
        )
    )


def plan_cur(spark, sf_dir):
    items = _tris(spark, sf_dir).filter(F.col("t3").isNotNull())
    cached = items.select("t3").transform(tracked_cache)
    total = cached.agg(F.count(F.lit(1)).alias("__n"))
    cands = misra_gries_candidates(cached, "t3", K)
    return _finish(cached, cands, total)


def plan_nocache(spark, sf_dir):
    items = _tris(spark, sf_dir).filter(F.col("t3").isNotNull()).select("t3")
    total = items.agg(F.count(F.lit(1)).alias("__n"))
    cands = misra_gries_candidates(items, "t3", K)
    return _finish(items, cands, total)


def plan_fused(spark, sf_dir):
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    # total trigrams without exploding: per-doc capped count
    total = docs.select(
        F.least(
            F.greatest(F.length("text") - 2, F.lit(0)), F.lit(MAXPOS)
        ).alias("w")
    ).agg(F.sum("w").alias("__n"))
    items = _tris(spark, sf_dir).filter(F.col("t3").isNotNull()).select("t3")
    cands = misra_gries_candidates(items, "t3", K)
    return _finish(items, cands, total)


def plan_direct(spark, sf_dir):
    # round-7 directive: never materialize the occurrence relation —
    # numpy-packed trigram codes + np.unique per Arrow batch emit
    # (trigram, partial count); every downstream phase aggregates
    # vocabulary-sized partials
    from candy_store_etl_spark.operators.sketches import (
        char_ngram_partial_counts,
        heavy_hitters_from_partials,
    )

    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    partials = char_ngram_partial_counts(
        docs, "text", n=3, max_pos=MAXPOS
    ).withColumnRenamed("ngram", "t3")
    return heavy_hitters_from_partials(partials, "t3", "cnt", t=T, k=K)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("AB_HEAP", "28g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    modes = {
        "cur": plan_cur,
        "nocache": plan_nocache,
        "fused": plan_fused,
        "direct": plan_direct,
    }
    ref = None
    for name, fn in modes.items():
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        release_caches()
        spark.catalog.clearCache()
        if ref is None:
            ref = rows
            print(f"{name}: {len(rows)} rows (reference)")
        else:
            assert rows == ref, f"{name} differs"
            print(f"{name}: identical")
    times = {m: [] for m in modes}
    order = list(modes)
    for r in range(reps):
        rot = order[r % len(order):] + order[: r % len(order)]
        for name in rot:
            t0 = time.monotonic()
            modes[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(time.monotonic() - t0)
            release_caches()
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
