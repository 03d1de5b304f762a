"""Chase the aged-session creep with driver-state counters.

Round-12 forensics established: a long-lived local session runs the
SAME maintained-chain ingest ~2x slower after ~30 batches, with ZERO
foreign cpu and ZERO Full GCs (GC log exonerated collection). The
remaining suspects are driver-side bookkeeping that grows with every
executed query: generated-code classes (every batch has unique
literals/paths, so every plan compiles fresh classes — class
unloading needs a classloader GC), the SQL status store (one entry
per execution), and plain JVM footprint.

This probe runs N uniform ingest batches in ONE session and records,
per batch: wall seconds, JVM loaded-class count (ClassLoadingMXBean),
driver RSS, and the number of SQL executions retained in the status
store. If wall tracks loadedClassCount (and RSS) while the status
store saturates at its retention cap, the creep is codegen-class
accumulation — the actionable answer for a long-lived ingest driver
is session recycling on a class-count budget, not a code fix in the
operator (which per-row-session measurements already show is flat).

Writes one JSON line; interpret by eye or paste into NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from candy_store_etl_spark.session import build_session  # noqa: E402

BATCHES = int(os.environ.get("CREEP_BATCHES", "30"))
SRC = "/root/testdata/sf0.01"  # ~500 docs per batch


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return 0.0


def _jvm_rss_mb(spark) -> float:
    # the driver JVM is this process's child; sum java RSS
    import subprocess

    out = subprocess.run(
        ["pgrep", "-f", "java.*probe-session-creep"],
        capture_output=True, text=True,
    ).stdout.split()
    total = 0
    for pid in out:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        total += int(line.split()[1])
        except OSError:
            pass
    return round(total / 1024, 1)


def main() -> None:
    from candy_store_etl_spark.operators.dedup import maintain_neardup_index
    from candy_store_etl_spark.sources.tpch import load_table

    spark = build_session(
        "probe-session-creep",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    classes = jvm.java.lang.management.ManagementFactory.getClassLoadingMXBean()
    status = spark.sparkContext._jsc.sc().statusStore()

    def _jobs_retained() -> int:
        # AppStatusStore.jobsList takes a Scala Option; build it via
        # py4j and fall back to -1 if the internal API shifts — the
        # probe's primary signal is the class count, this is color
        try:
            return int(
                status.jobsList(jvm.scala.Option.empty()).size()
            )
        except Exception:
            return -1

    docs = load_table(spark, SRC, "documents")
    root = tempfile.mkdtemp(prefix="creep_")
    ix = os.path.join(root, "index")
    rows = []
    for b in range(BATCHES):
        # unique ids per batch (the varied-literals condition): salt
        # doc_id by batch so every batch is "new" documents
        batch = docs.select(
            (F.col("doc_id") + F.lit(b * 1_000_000)).alias("doc_id"),
            "text",
        )
        t0 = time.monotonic()
        maintain_neardup_index(spark, batch, ix, batch_tag=f"b{b}")
        wall = round(time.monotonic() - t0, 2)
        rows.append({
            "batch": b,
            "wall_s": wall,
            "loaded_classes": int(classes.getLoadedClassCount()),
            "jvm_rss_mb": _jvm_rss_mb(spark),
            "py_rss_mb": _rss_mb(),
            "sql_store_jobs": _jobs_retained(),
        })
        print(json.dumps(rows[-1]), flush=True)
    out = {
        "first3_wall": [r["wall_s"] for r in rows[:3]],
        "last3_wall": [r["wall_s"] for r in rows[-3:]],
        "class_growth": rows[-1]["loaded_classes"] - rows[0]["loaded_classes"],
        "jvm_rss_growth_mb": rows[-1]["jvm_rss_mb"] - rows[0]["jvm_rss_mb"],
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    spark.stop()


if __name__ == "__main__":
    main()
