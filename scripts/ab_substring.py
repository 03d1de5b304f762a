"""Interleaved A/B for the exact-substring pair plan (round-6 item 1).

Modes, all producing identical results (asserted):
  cur    — round-5 production: keep-band agg + two-sided gram self-join
           + count_distinct(g) per pair
  dl     — doc-list restructure: keep-band agg + one gram-side join,
           groupBy(g) collect_list reusing the join partitioning,
           in-row pair generation, count(*) per pair
  dl64   — doc-list + 60-bit integer gram keys (conv(md5[1:15])) for
           every shuffle instead of the 32-char md5 string

Rotated execution order across repetitions (the only trustworthy
micro-comparison on this box — see .claude/skills/verify).

Usage: python scripts/ab_substring.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from candy_store_etl_spark.caching import release_caches, tracked_cache
from candy_store_etl_spark.functions.text import tokens
from candy_store_etl_spark.operators.dedup import explode_nonempty
from candy_store_etl_spark.sources.tpch import load_table, repartition_for_compute

N = 8
MAX_DF = 10
MAX_TOKENS = 4096


def _grams(spark, sf_dir, int_keys: bool) -> DataFrame:
    docs = repartition_for_compute(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", tokens(F.col("text")).alias("tk"))
    key = lambda i: F.md5(F.concat_ws(" ", F.slice("tk", i, N)))  # noqa: E731
    if int_keys:
        key = lambda i: F.conv(  # noqa: E731
            F.substring(F.md5(F.concat_ws(" ", F.slice("tk", i, N))), 1, 15),
            16,
            10,
        ).cast("long")
    windows = F.transform(
        F.sequence(
            F.lit(1), F.least(F.size("tk") - (N - 1), F.lit(MAX_TOKENS))
        ),
        key,
    )
    return explode_nonempty(
        docs.filter(F.size("tk") >= N), "g", F.array_distinct(windows), "doc_id"
    ).transform(tracked_cache)


def plan_cur(spark, sf_dir) -> DataFrame:
    grams = _grams(spark, sf_dir, int_keys=False)
    keep = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= 2) & (F.col("df") <= MAX_DF)
    )
    a = grams.join(keep.select("g"), "g")
    b = grams.select(F.col("doc_id").alias("id_b"), "g")
    return (
        a.select(F.col("doc_id").alias("id_a"), "g")
        .join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count_distinct("g").alias("shared_windows"))
    )


def _doclist_pairs(grams: DataFrame) -> DataFrame:
    keep = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= 2) & (F.col("df") <= MAX_DF)
    )
    survivors = grams.join(keep.select("g"), "g")
    doclists = survivors.groupBy("g").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    pairs = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds) - i - 1),"
        "           y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        explode_nonempty(doclists, "p", pairs)
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )


def plan_dl(spark, sf_dir) -> DataFrame:
    return _doclist_pairs(_grams(spark, sf_dir, int_keys=False))


def plan_dl64(spark, sf_dir) -> DataFrame:
    return _doclist_pairs(_grams(spark, sf_dir, int_keys=True))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    heap = os.environ.get("AB_HEAP", "8g")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", heap)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    modes = {"cur": plan_cur, "dl": plan_dl, "dl64": plan_dl64}

    # correctness first: identical pair sets
    ref = None
    for name, fn in modes.items():
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        release_caches()
        spark.catalog.clearCache()
        if ref is None:
            ref = rows
            print(f"{name}: {len(rows)} pairs (reference)")
        else:
            assert rows == ref, f"{name} result differs"
            print(f"{name}: identical")

    # warm-up already done by the correctness pass; now timed reps with
    # rotated order
    times: dict[str, list[float]] = {m: [] for m in modes}
    order = list(modes)
    for r in range(reps):
        rot = order[r % len(order) :] + order[: r % len(order)]
        for name in rot:
            t0 = time.monotonic()
            modes[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            times[name].append(dt)
            release_caches()
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(
            f"{name}: best={min(ts):.3f}s median={sorted(ts)[len(ts)//2]:.3f}s"
            f" all={[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
