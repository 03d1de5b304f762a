"""A/B: bucketed point lookup vs full-scan filter, at sf0.1/sf1/sf10.

Quantifies the serving contract behind ``operators/colocated.py``'s
``point_lookup``: a K-key probe should cost O(K) file opens (hash ->
bucket -> file-name test, planned from the log), while the plain
``read_snapshot().filter(key IN ...)`` scans every file. The measured
gap is the number a 100 TB claim needs — at local bench sizes the
fixed per-query overhead narrows it, so the interesting column is how
the gap GROWS with the table.

Method: interleaved, rotated mode order (the repo's standing A/B
methodology — fixed order measures first-run-after-switch effects,
not the code), best-of-N per mode per SF, untimed warm-up per SF.
Appends one line per SF to stdout; paste the table into NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from candy_store_etl_spark.caching import release_caches  # noqa: E402
from candy_store_etl_spark.operators.colocated import (  # noqa: E402
    keyset_lookup,
    point_lookup,
    write_bucketed,
)
from candy_store_etl_spark.session import build_session  # noqa: E402
from candy_store_etl_spark.sources import table_log as tl  # noqa: E402
from candy_store_etl_spark.sources.tpch import load_table  # noqa: E402

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf10", "/root/repo/.scale/sf10"),
]
N_BUCKETS = int(os.environ.get("AB_LOOKUP_BUCKETS", "64"))
_NKEYS = int(os.environ.get("AB_LOOKUP_NKEYS", "5"))
# 5 keys by default; large sets step through the key space (the
# per-key point_lookup mode is skipped above 50 keys — its one plan
# branch per key is exactly the shape that does not scale, which is
# what the keyset comparison exists to show)
KEYS = (
    [3, 7, 1001, 4242, 9999]
    if _NKEYS == 5
    else [3 + 7 * i for i in range(_NKEYS)]
)
TRIALS = 3


def _ensure_table(spark, sf_dir: str, out_dir: str) -> None:
    if tl.current_version(out_dir) == 0:
        return
    lines = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    write_bucketed(lines, out_dir, key_col="okey", n_buckets=N_BUCKETS)


def _lookup(spark, d: str) -> int:
    return point_lookup(spark, d, KEYS).count()


def _keyset(spark, d: str) -> int:
    return keyset_lookup(spark, d, KEYS).count()


def _scan(spark, d: str) -> int:
    return (
        tl.read_snapshot(spark, d)
        .filter(F.col("okey").isin(KEYS))
        .count()
    )


def main() -> None:
    import tempfile

    spark = build_session("ab-point-lookup", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    ))
    spark.sparkContext.setLogLevel("ERROR")
    for label, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"{label}: missing ({sf_dir}) — skipped")
            continue
        d = os.path.join(
            tempfile.gettempdir(), f"csetl_ablookup_{label}_{N_BUCKETS}"
        )
        _ensure_table(spark, sf_dir, d)
        modes = {"lookup": _lookup, "keyset": _keyset, "scan": _scan}
        if len(KEYS) > 50:
            modes.pop("lookup")
        best = {m: float("inf") for m in modes}
        rows = {}
        for m, fn in modes.items():  # untimed warm-up per mode
            rows[m] = fn(spark, d)
        for t in range(TRIALS):
            order = list(modes)
            if t % 2:
                order.reverse()
            for m in order:
                release_caches()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                modes[m](spark, d)
                best[m] = min(best[m], time.perf_counter() - t0)
        n_files = len(tl.snapshot_files(d))
        assert len({rows[m] for m in modes}) == 1, (label, rows)
        cells = " / ".join(
            f"{m} {best[m]*1000:.0f} ms" for m in modes
        )
        print(
            f"{label}: {cells} "
            f"(scan/keyset {best['scan']/best['keyset']:.1f}x) — "
            f"{len(KEYS)} keys, {n_files} files, rows={rows['keyset']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
