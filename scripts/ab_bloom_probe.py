"""Bloom membership serving across three decades: pruned probe vs
full scan, and the in-place index build cost.

The claim (`sources/table_log.add_bloom_index` +
`operators/colocated.serve`'s bloom-pruned route): a point probe on a
column the layout cannot serve (off the bucket key) opens only the
files whose committed bitmap can hold the probe values — O(probe
count) files on a secondary key functionally tied to the bucket key —
while the fallback scan opens every file. The gap must WIDEN with
scale (the scan pays O(table), the probe pays O(matching files +
probe-hash job)), and the index build must stay a single read pass.

Fixture per decade: orders bucketed by o_custkey (the layout), then
add_bloom_index on o_orderkey (the retrofit — zero data rewritten).
Probes are 5 orderkeys present at every scale (copy 0 of the
replicated dataset keeps original ids). Methodology per the house
rules: quiet-box wait, ONE Spark session per row (long-lived sessions
inflate late rows — NOTES round-12 forensics), an untimed warm-up
probe per session, min of 3 timed runs, per-row ambient cpu
attribution. Writes/replaces the "## Bloom membership serving" section
of SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from candy_store_etl_spark.session import build_session  # noqa: E402

ROWS = [
    ("sf0.1", "/root/testdata/sf0.1", 32),
    ("sf1", "/root/repo/.scale/sf1", 64),
    ("sf10", "/root/repo/.scale/sf10", 256),
]
PROBES = [33, 577, 901, 1203, 1407]  # original-copy ids: every scale
HEADER = "## Bloom membership serving: pruned probe vs forced scan"


def _fixture(spark, sf_dir: str, buckets: int) -> tuple[str, float]:
    """Content-keyed bucketed+indexed orders table; returns (dir,
    index build seconds — 0.0 when the fixture was reused)."""
    from candy_store_etl_spark.operators.colocated import write_bucketed
    from candy_store_etl_spark.sources import table_log as tl
    from candy_store_etl_spark.sources.scratch import (
        content_fingerprint,
        ensure_scratch,
    )
    from candy_store_etl_spark.sources.tpch import load_table

    key = content_fingerprint(
        os.path.join(sf_dir, "orders.parquet"),
        extra=f"abbloom-{buckets}",
    )
    root = os.path.join(
        tempfile.gettempdir(), f"csetl_abblm_{key}"
    )
    t = os.path.join(root, "orders")
    build_s = [0.0]

    def _intact(d: str) -> bool:
        td = os.path.join(d, "orders")
        if tl.current_version(td) != 1:
            return False
        stats = tl.snapshot_file_stats(td)
        if not stats or any(
            "o_orderkey" not in e.get("bloom", {})
            for e in stats.values()
        ):
            return False
        return all(os.path.exists(p) for p in tl.snapshot_files(td))

    def _build(stage: str) -> None:
        td = os.path.join(stage, "orders")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        write_bucketed(
            orders, td, key_col="o_custkey", n_buckets=buckets
        )
        t0 = time.monotonic()
        tl.add_bloom_index(spark, td, ["o_orderkey"])
        build_s[0] = round(time.monotonic() - t0, 2)

    ensure_scratch(root, _build, _intact)
    # 0.0 means ensure_scratch reused an intact fixture — report that
    # honestly instead of a fake instant build
    return t, build_s[0]


def measure(spark, sf_dir: str, buckets: int) -> dict:
    from candy_store_etl_spark.operators.colocated import serve

    table, index_s = _fixture(spark, sf_dir, buckets)

    def _run(**kw) -> tuple[float, dict]:
        t0 = time.monotonic()
        df, info = serve(
            spark, table, PROBES, key_col="o_orderkey",
            record_routes=False, **kw,
        )
        n = df.count()
        assert n == len(PROBES), (n, info)
        return time.monotonic() - t0, info

    _run()  # session warm-up, untimed
    bloom_s, scan_s = [], []
    binfo = sinfo = None
    for _ in range(3):
        s, binfo = _run()
        bloom_s.append(round(s, 3))
        # threshold 2.0 is unreachable: forces the scan fallback —
        # the exact rows, different plan (the A/B contract)
        s, sinfo = _run(bloom_coverage_threshold=2.0)
        scan_s.append(round(s, 3))
    assert binfo["route"] == "bloom-pruned", binfo
    assert sinfo["route"] == "scan-off-key", sinfo
    return {
        "orders_rows": spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).count(),
        "files_total": binfo["files_total"],
        "files_kept": binfo["files_scanned"],
        "index_build_s": index_s if index_s else "reused",
        "bloom_probe_s": min(bloom_s),
        "bloom_samples": bloom_s,
        "scan_probe_s": min(scan_s),
        "scan_samples": scan_s,
        "speedup": round(min(scan_s) / max(min(bloom_s), 1e-9), 2),
    }


def main() -> None:
    from bench import _ambient_meter, _wait_for_quiet, splice_section

    ambient = _wait_for_quiet()
    results = {}
    for label, d, buckets in ROWS:
        if not os.path.isdir(d):
            print(f"skip {label}: {d} missing", file=sys.stderr)
            continue
        spark = build_session(
            "ab-bloom-probe",
            cpus=int(
                os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
            ),
        )
        spark.sparkContext.setLogLevel("ERROR")
        meter = _ambient_meter()
        results[label] = measure(spark, d, buckets)
        amb, steal = meter()
        results[label]["ambient_cpu_sec"] = round(amb, 1)
        results[label]["steal_cpu_sec"] = round(steal, 1)
        print(label, results[label], flush=True)
        spark.stop()

    md_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(md_path) as f:
        existing = f.read()
    lines = [
        f"\n{HEADER}\n",
        "\nserve()'s bloom-pruned route vs the same probe forced onto "
        "the scan fallback (`bloom_coverage_threshold=2.0` — identical "
        "rows, different plan): 5 secondary-key lookups on orders "
        "bucketed by o_custkey and indexed IN PLACE on o_orderkey "
        "(`add_bloom_index`: a stats-only commit, zero data "
        "rewritten). The probe opens <= 5 of the bucket files at every "
        "decade while the scan opens all of them, so the gap widens "
        "with scale; the index build stays one distributed read pass. "
        "One Spark session per row, untimed warm-up probe per session, "
        f"min of 3 (quiet-wait ambient {ambient:.2f}).\n",
        "\n| scale (orders rows) | files kept/total | index build (s) "
        "| bloom probe (s, min) | forced scan (s, min) | scan/bloom | "
        "foreign cpu-s |\n"
        "|---|---|---|---|---|---|---|\n",
    ]
    for label, r in results.items():
        lines.append(
            f"| {label} ({r['orders_rows']:,}) "
            f"| {r['files_kept']}/{r['files_total']} "
            f"| {r['index_build_s']} "
            f"| {r['bloom_probe_s']} "
            f"| {r['scan_probe_s']} "
            f"| {r['speedup']}x "
            f"| {r.get('ambient_cpu_sec', 0)} |\n"
        )
    lines.append(
        "\nReading the curve: the bloom route pays a FIXED cost (the "
        "one-job probe hashing + per-file bitmap tests) and O(kept "
        "files) of I/O, the scan pays O(table) — so on this box the "
        "probe loses below ~1M rows and crosses over inside the "
        "second decade, the same local-mode trade recorded for the "
        "SPJ/shuffle comparison (warm page cache + 32 cores make "
        "full scans artificially cheap here; at cold-storage scale "
        "the gap IS the file-open count). A kept count one above the "
        "probe count is a bitmap false positive doing exactly what "
        "the sizing math predicts (~16 bits/row, k=5 -> ~1e-3 per "
        "file-value) — lossless either way, the residual filter "
        "drops it.\n"
    )
    with open(md_path, "w") as f:
        f.write(splice_section(existing, f"\n{HEADER}\n", "".join(lines)))
    print(json.dumps({"ab_bloom_probe": results}))


if __name__ == "__main__":
    main()
