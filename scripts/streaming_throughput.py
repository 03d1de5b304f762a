"""Measure sustained streaming throughput + state-store growth for the
streaming operator family (round-5 item 3 started with keyed dedup;
round-6 item 6 broadens to an operator whose state GROWS).

Method: the sf1 events table (and a lineitem-derived allocation feed)
is staged as N parquet files; the file-source stream
(maxFilesPerTrigger=1) then yields exactly N micro-batches into a
foreachBatch count sink (forces full materialization per batch, no
driver collect). Sustained throughput is sum(numInputRows) /
sum(triggerExecution) over completed batches EXCLUDING the first
(cold Python workers + empty state store make batch 0
unrepresentative; the point of a streaming number is steady state).
State growth is read from each batch's stateOperators progress
(numRowsTotal / numRowsUpdated) — the evidence that throughput parity
between state policies holds on operators whose state actually grows,
not just on dedup.

Operators measured:
- global dedup (dropDuplicates, state never expires) — the gate twin;
- dropDuplicatesWithinWatermark — the bounded-state production policy;
- windowed hourly stats (watermarked tumbling window aggregate);
- stateful greedy allocation (applyInPandasWithState, running
  per-product stock — the flagship's streaming twin).

Appends a section to SCALING.md — run AFTER scripts/scaling_curve.py,
which rewrites that file.

Usage: python scripts/streaming_throughput.py [--sf-dir .scale/sf1]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from candy_store_etl_spark.session import build_session  # noqa: E402

N_FILES = 12  # micro-batch count (>= 10 per the round-4 directive)


def _stage(spark, build_df, src_path: str, stage_dir: str) -> None:
    """Lay a relation out as N_FILES parquet files so
    maxFilesPerTrigger=1 yields N_FILES micro-batches. The stage is
    keyed on the SOURCE file's identity (size + ns-mtime marker), so a
    regenerated source rebuilds the stage instead of silently
    measuring stale data (the same staleness class
    pruned_range_scan_stats fingerprints against)."""
    st = os.stat(src_path)
    marker_want = f"{st.st_size}:{st.st_mtime_ns}:{N_FILES}"
    marker_path = os.path.join(stage_dir, "_SOURCE_ID")
    if os.path.isdir(stage_dir):
        try:
            with open(marker_path) as f:
                if f.read() == marker_want:
                    return
        except OSError:
            pass
        shutil.rmtree(stage_dir)
    build_df(spark).repartition(N_FILES).write.mode("overwrite").parquet(
        stage_dir
    )
    with open(marker_path, "w") as f:
        f.write(marker_want)


def _run(spark, stage_dir: str, make_query, schema: str | None = None) -> dict:
    """Run stream -> make_query(stream) -> foreachBatch count sink with
    availableNow; return throughput + state-growth stats."""
    if schema is None:
        from candy_store_etl_spark.streaming.events import stream_events

        stream = stream_events(spark, stage_dir)
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(stage_dir)
        )
    out = make_query(stream)
    sink_rows = []

    def sink(batch_df, batch_id):  # full materialization, no collect
        sink_rows.append(batch_df.count())

    ckpt = tempfile.mkdtemp(prefix="stream_tp_ckpt_")
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    batches = [p for p in prog if p.get("numInputRows", 0) > 0]
    steady = batches[1:] if len(batches) > 1 else batches
    rows = sum(p["numInputRows"] for p in steady)
    secs = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000.0
    state_total = [
        sum(op.get("numRowsTotal", 0) for op in p.get("stateOperators", []))
        for p in batches
    ]
    state_updated = [
        sum(op.get("numRowsUpdated", 0) for op in p.get("stateOperators", []))
        for p in batches
    ]
    state_bytes = [
        sum(
            op.get("memoryUsedBytes", 0) for op in p.get("stateOperators", [])
        )
        for p in batches
    ]
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "batches": len(batches),
        "input_rows": sum(p["numInputRows"] for p in batches),
        "emitted_rows": sum(sink_rows),
        "sustained_rows_per_sec": round(rows / secs) if secs else None,
        "wall_seconds": round(wall, 2),
        "state_rows_final": state_total[-1] if state_total else 0,
        "state_rows_max": max(state_total, default=0),
        "state_rows_updated_per_batch": (
            round(sum(state_updated) / len(state_updated))
            if state_updated
            else 0
        ),
        "state_mb_max": round(max(state_bytes, default=0) / 1e6, 1),
    }


def _run_merge_upsert(spark, stage_dir: str) -> dict:
    """CDC-style warehouse sink: every micro-batch MERGE-upserts a
    per-user aggregate into a parquet state table via the full-outer
    reconciliation (the plan a Delta MERGE lowers to), guarded by a
    batch-id ledger (foreachBatch is at-least-once). State lives in
    the warehouse, not the state store, so the state columns report
    the table's row count and on-disk size instead of stateOperators."""
    import glob as _glob

    from pyspark.sql import functions as F

    from candy_store_etl_spark.streaming.events import stream_events

    workdir = tempfile.mkdtemp(prefix="stream_tp_merge_")
    state_dir = os.path.join(workdir, "state")
    ledger_dir = os.path.join(workdir, "ledger")
    os.makedirs(ledger_dir)

    def merge_batch(batch_df, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, str(batch_id))
        if os.path.exists(marker):
            return
        inc = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
        )
        if os.path.isdir(state_dir):
            cur = batch_df.sparkSession.read.parquet(state_dir)
            t = cur.select(
                F.col("user_id").alias("k"),
                F.col("n_events").alias("tn"),
                F.col("cents").alias("tc"),
            )
            merged = t.join(inc, t.k == inc.user_id, "full_outer").select(
                F.coalesce("k", "user_id").alias("user_id"),
                (
                    F.coalesce("tn", F.lit(0))
                    + F.coalesce("n_events", F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce("tc", F.lit(0)) + F.coalesce("cents", F.lit(0))
                ).alias("cents"),
            )
        else:
            merged = inc
        swap = state_dir + f".stage{batch_id}"
        merged.write.mode("overwrite").parquet(swap)
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(swap, state_dir)
        with open(marker, "w") as fh:
            fh.write("applied")

    ckpt = os.path.join(workdir, "ckpt")
    q = (
        stream_events(spark, stage_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    batches = [p for p in prog if p.get("numInputRows", 0) > 0]
    steady = batches[1:] if len(batches) > 1 else batches
    rows = sum(p["numInputRows"] for p in steady)
    secs = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000.0
    state_rows = spark.read.parquet(state_dir).count()
    state_bytes = sum(
        os.path.getsize(f)
        for f in _glob.glob(os.path.join(state_dir, "*.parquet"))
    )
    out = {
        "batches": len(batches),
        "input_rows": sum(p["numInputRows"] for p in batches),
        "emitted_rows": state_rows,
        "sustained_rows_per_sec": round(rows / secs) if secs else None,
        "wall_seconds": round(wall, 2),
        "state_rows_final": state_rows,
        "state_rows_max": state_rows,
        "state_rows_updated_per_batch": state_rows,  # full rewrite/batch
        "state_mb_max": round(state_bytes / 1e6, 1),
    }
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def _run_merge_upsert_partitioned(
    spark, sf_dir: str, *, saturating: bool = False, routed: bool = False,
    roundtrip: bool = False,
) -> dict:
    """The round-6 verdict's directive #3: the CDC warehouse sink with
    rewrite volume proportional to TOUCHED KEYS, not table size
    (streaming/cdc.py — hash-bucketed files committed through the
    table log; untouched buckets are never opened). The default feed
    is CDC-shaped: one seed batch carries ~98.9% of history, then 11
    trickle batches each update ~15 users (one user_id%%1000 slice) —
    the arrival pattern a warehouse absorbs in production. Reported
    rewrite fractions are means over the TRICKLE batches; the
    full-rewrite sink's fraction is 1.0 per batch by construction.

    ``saturating=True`` replaces the trickle feed with 12 equal-ROW
    batches each covering ~8% of the key space (user_id %% 12 slices):
    the full-input-volume run that makes the sink's rows/s comparable
    to the full-rewrite sink's (whose batches are the same size) —
    the trickle run's 1k rows/s is trickle-shaped INPUT, not a sink
    ceiling, and this row pins that.

    ``routed=True`` swaps in the coverage-routed sink
    (``make_routed_cdc_sink``): the measurement that shows the router
    matching the better strategy in BOTH regimes — trickle batches
    stay partitioned (same rewrite fractions as the pure partitioned
    sink), saturating batches full-rewrite at bulk grouping (closing
    the 20x loss the round-9 saturated row documented as a manual
    decision). The per-batch routes land in the output."""
    from pyspark.sql import functions as F

    from candy_store_etl_spark.sources import table_log as tl
    from candy_store_etl_spark.streaming.cdc import (
        make_partitioned_cdc_sink,
        make_routed_cdc_sink,
    )

    workdir = tempfile.mkdtemp(prefix="stream_tp_cdcpart_")
    feed_dir = os.path.join(workdir, "feed")
    os.makedirs(feed_dir)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "value"
    )
    if roundtrip:
        # trickle -> saturated -> trickle: seed, 2 trickles at fine
        # grouping, one saturating batch (coarsens via full-rewrite),
        # then 5 trickles — with refine_after=3 the THIRD one executes
        # as route 'refine' and the last two measure recovered trickle
        # economics over the re-fined layout. Trickles are SINGLE-KEY
        # batches (7 probe keys, a metadata-sized collect): a ~100-key
        # %1000 slice is trickle-shaped on the fine 1024-file layout
        # but SATURATES the ~32-file coarse one (100 keys cover every
        # group), so the router would keep full-rewriting — correctly —
        # and the hysteresis would never be exercised
        keys = [
            r[0]
            for r in ev.select("user_id")
            .distinct()
            .orderBy("user_id")
            .limit(7)
            .collect()
        ]
        slices = (
            [ev.filter(~F.col("user_id").isin(keys))]
            + [ev.filter(F.col("user_id") == keys[0])]
            + [ev.filter(F.col("user_id") == keys[1])]
            + [ev]
            + [ev.filter(F.col("user_id") == k) for k in keys[2:]]
        )
    elif saturating:
        # 12 equal-volume batches, each touching ~1/12 of the keys
        slices = [
            ev.filter(F.col("user_id") % 12 == i) for i in range(12)
        ]
    else:
        # slices as single ordered files: 00 = seed, 01..11 = trickles
        slices = [ev.filter(F.col("user_id") % 1000 < 989)] + [
            ev.filter(F.col("user_id") % 1000 == 989 + i)
            for i in range(11)
        ]
    for i, s in enumerate(slices):
        tmp = os.path.join(workdir, f"slice{i}")
        s.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob as _glob

        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(feed_dir, f"{i:05d}.parquet"))
        shutil.rmtree(tmp)

    table = os.path.join(workdir, "warehouse")
    metrics: list[dict] = []

    def increments(batch_df):
        return batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
        )

    routed = routed or roundtrip  # a roundtrip only exists for the router
    make_sink = make_routed_cdc_sink if routed else make_partitioned_cdc_sink
    sink_kw = {"refine_after": 3} if roundtrip else {}
    sink = make_sink(
        table,
        increments,
        key_col="user_id",
        add_cols=("n_events", "cents"),
        n_buckets=1024,
        metrics=metrics,
        **sink_kw,
    )
    ckpt = os.path.join(workdir, "ckpt")
    q = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    batches = [p for p in prog if p.get("numInputRows", 0) > 0]
    steady = batches[1:] if len(batches) > 1 else batches
    rows = sum(p["numInputRows"] for p in steady)
    secs = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000.0
    # parity: the merged warehouse == the one-shot batch aggregate
    got = sorted(
        tuple(r) for r in tl.read_snapshot(spark, table).collect()
    )
    want = sorted(
        tuple(r)
        for r in increments(spark.read.parquet(feed_dir)).collect()
    )
    assert got == want, "partitioned CDC merge diverged from batch truth"
    # rewrite volume over the steady batches: for the trickle feed
    # that is every batch but the seed (full-rewrite fractions are
    # 1.0/1.0 by construction); for the saturating feed every batch
    # after the cold first one is a steady CDC batch
    if roundtrip:
        md = {m["batch_id"]: m for m in metrics}
        assert md[3]["route"] == "full-rewrite", md[3]["route"]
        assert md[6]["route"] == "refine", md[6]["route"]
        # the generic trickle columns report the POST-REFINE trickles —
        # the round trip's recovered economics
        trickles = [md[7], md[8]]
    elif saturating:
        trickles = metrics[1:]
    else:
        trickles = [m for m in metrics if m["touched_buckets"] < 512]
    frac_files = sum(
        m["files_rewritten"] / m["files_total"] for m in trickles
    ) / max(len(trickles), 1)
    frac_rows = sum(
        m["rows_rewritten"] / m["rows_total"] for m in trickles
    ) / max(len(trickles), 1)
    state_rows = tl.read_snapshot(spark, table).count()
    state_bytes = sum(
        os.path.getsize(p) for p in tl.snapshot_files(table)
    )
    out = {
        "batches": len(batches),
        "input_rows": sum(p["numInputRows"] for p in batches),
        "emitted_rows": state_rows,
        "sustained_rows_per_sec": round(rows / secs) if secs else None,
        "wall_seconds": round(wall, 2),
        "state_rows_final": state_rows,
        "state_rows_max": state_rows,
        "state_rows_updated_per_batch": (
            round(sum(m["rows_rewritten"] for m in trickles) / len(trickles))
            if trickles
            else 0
        ),
        "state_mb_max": round(state_bytes / 1e6, 1),
        "rewrite_frac_files_mean": round(frac_files, 4),
        "rewrite_frac_rows_mean": round(frac_rows, 4),
        "trickle_batches": len(trickles),
    }
    if routed:
        # the router's per-batch decisions, counted: the evidence that
        # it matched the better strategy in this regime
        out["routes"] = {
            r: sum(1 for m in metrics if m["route"] == r)
            for r in sorted({m["route"] for m in metrics})
        }
        out["files_final"] = len(tl.snapshot_files(table))
    if roundtrip:
        def _ff(ms):
            return round(
                sum(m["files_rewritten"] / m["files_total"] for m in ms)
                / max(len(ms), 1),
                4,
            )

        out["trickle_frac_fine_pre"] = _ff([md[1], md[2]])
        out["trickle_frac_coarse"] = _ff([md[4], md[5]])
        out["trickle_frac_fine_post"] = _ff(trickles)
        out["files_after_coarsen"] = md[4]["files_total"]
    if saturating or routed:
        shutil.rmtree(workdir, ignore_errors=True)
        return out
    # layout compaction: coarsen 1-bucket files into 8-bucket groups
    # in one atomic commit, then replay one trickle through a fresh
    # (restarted) sink to measure the amplification trade — file
    # count collapses 8x, per-trickle rewrite volume rises to ~one
    # group (still a bounded fraction, never the table)
    from candy_store_etl_spark.streaming.cdc import compact_warehouse

    files_fine = len(tl.snapshot_files(table))
    compact_warehouse(
        spark, table, key_col="user_id", n_buckets=1024,
        buckets_per_file=8,
    )
    files_coarse = len(tl.snapshot_files(table))
    post_metrics: list[dict] = []
    sink_post = make_partitioned_cdc_sink(
        table,
        increments,
        key_col="user_id",
        add_cols=("n_events", "cents"),
        n_buckets=1024,
        metrics=post_metrics,
    )
    sink_post(
        spark.read.parquet(os.path.join(feed_dir, "00011.parquet")), 999
    )
    pm = post_metrics[0]
    out["compaction"] = {
        "files_fine": files_fine,
        "files_coarse": files_coarse,
        "post_rewrite_frac_files": round(
            pm["files_rewritten"] / pm["files_total"], 4
        ),
        "post_rewrite_frac_rows": round(
            pm["rows_rewritten"] / pm["rows_total"], 4
        ),
    }
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", "--events-dir", dest="sf_dir",
                    default="/root/repo/.scale/sf1")
    args = ap.parse_args()

    from bench import _wait_for_quiet

    from candy_store_etl_spark.streaming.events import (
        dedup_event_stream,
        interval_join_streams,
        stream_events,
        streaming_inventory_allocation,
        streaming_inventory_allocation_bucketed,
        windowed_event_stats,
    )

    ambient = _wait_for_quiet()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("candy-store-etl-stream-tp", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    scale_root = os.path.dirname(args.sf_dir.rstrip("/"))

    ev_stage = os.path.join(scale_root, "stream_events_staged")
    _stage(
        spark,
        lambda s: s.read.parquet(os.path.join(args.sf_dir, "events.parquet")),
        os.path.join(args.sf_dir, "events.parquet"),
        ev_stage,
    )

    # allocation feed: lineitem as (product_id, seq, qty, event_time);
    # seq = orderkey * 8 + linenumber keeps the per-product replay
    # order deterministic across partitionings (linenumber < 8 in
    # TPC-H-shaped data)
    li_src = os.path.join(args.sf_dir, "lineitem.parquet")

    def _alloc_feed(s):
        return (
            s.read.parquet(li_src)
            .select(
                F.col("l_partkey").alias("product_id"),
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("seq"),
                F.col("l_quantity").cast("int").alias("qty"),
                F.lit(None).cast("timestamp").alias("event_time"),
            )
        )

    alloc_stage = os.path.join(scale_root, "stream_alloc_staged")
    _stage(spark, _alloc_feed, li_src, alloc_stage)
    stock0 = {
        int(r.p_partkey): int(r.p_size) * 40
        for r in spark.read.parquet(
            os.path.join(args.sf_dir, "part.parquet")
        ).select("p_partkey", "p_size").collect()
    }
    alloc_schema = "product_id long, seq long, qty int, event_time timestamp"

    # warm-up run (worker fork + codegen), then the measured runs
    _run(spark, ev_stage, lambda s: dedup_event_stream(s, within_watermark=False))
    results = {
        "streaming_dedup_global": _run(
            spark, ev_stage,
            lambda s: dedup_event_stream(s, within_watermark=False),
        ),
        "streaming_dedup_within_watermark": _run(
            spark, ev_stage,
            lambda s: dedup_event_stream(s, within_watermark=True),
        ),
        "streaming_hourly_stats": _run(
            spark, ev_stage, windowed_event_stats
        ),
        # stream-stream interval join: the events feed read through
        # two independent source readers — the two sides buffer keyed
        # state independently and the time bound drives BOTH buffers'
        # expiry (the state-growth story a stream-stream join lives or
        # dies by)
        "streaming_interval_join": _run(
            spark,
            ev_stage,
            lambda s: interval_join_streams(
                s, stream_events(spark, ev_stage)
            ),
        ),
        "streaming_cdc_merge_upsert": _run_merge_upsert(spark, ev_stage),
        "streaming_cdc_merge_partitioned": _run_merge_upsert_partitioned(
            spark, args.sf_dir
        ),
        "streaming_cdc_merge_partitioned_saturated": (
            _run_merge_upsert_partitioned(
                spark, args.sf_dir, saturating=True
            )
        ),
        # the coverage-ROUTED sink in both regimes: trickle must match
        # the partitioned sink (router stays partitioned), saturated
        # must recover the bulk full-rewrite throughput (router
        # full-rewrites at bulk grouping) — the round-9 verdict's
        # "manual decision" gap, closed and measured
        "streaming_cdc_merge_routed_trickle": (
            _run_merge_upsert_partitioned(spark, args.sf_dir, routed=True)
        ),
        "streaming_cdc_merge_routed_saturated": (
            _run_merge_upsert_partitioned(
                spark, args.sf_dir, saturating=True, routed=True
            )
        ),
        "streaming_cdc_merge_roundtrip": (
            _run_merge_upsert_partitioned(
                spark, args.sf_dir, roundtrip=True
            )
        ),
        "streaming_stateful_allocation": _run(
            spark, alloc_stage,
            lambda s: streaming_inventory_allocation(s, stock0),
            schema=alloc_schema,
        ),
        "streaming_stateful_allocation_bucketed": _run(
            spark, alloc_stage,
            lambda s: streaming_inventory_allocation_bucketed(
                s, stock0, buckets=64
            ),
            schema=alloc_schema,
        ),
    }

    md_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    # idempotent rewrite: a re-run REPLACES only the streaming section,
    # scoped to the next "## " header (the truncate-to-EOF form this
    # replaces clobbered every section written after it — it destroyed
    # the sf100 third-decade table once); ONE header definition shared
    # with scaling_curve.py's preservation. The section body is built
    # in a buffer and spliced in place so section ORDER is preserved.
    from bench import SCALING_STREAM_HEADER as header
    with io.StringIO() as f:
        f.write(
            header + "\n"
            f"Feeds from `{args.sf_dir}` staged as {N_FILES} files → "
            f"{N_FILES} micro-batches (maxFilesPerTrigger=1), "
            "foreachBatch count sink, availableNow trigger; sustained "
            "rows/sec = numInputRows / triggerExecution over "
            "steady-state batches (batch 0 excluded: cold workers + "
            "empty state store). State columns read from each batch's "
            f"stateOperators progress. local[{cpus}], ambient load "
            f"{ambient:.1f}.\n\n"
            "| query | batches | input rows | emitted | sustained "
            "rows/s | state rows (final/max) | state upd/batch | "
            "state MB (max) | wall (s) |\n|---|---|---|---|---|---|"
            "---|---|---|\n"
        )
        for name, r in results.items():
            f.write(
                f"| {name} | {r['batches']} | {r['input_rows']} "
                f"| {r['emitted_rows']} | {r['sustained_rows_per_sec']} "
                f"| {r['state_rows_final']}/{r['state_rows_max']} "
                f"| {r['state_rows_updated_per_batch']} "
                f"| {r['state_mb_max']} "
                f"| {r['wall_seconds']} |\n"
            )
        f.write(
            "\nThe within-watermark dedup carries the same keyed "
            "state-store plan but expires state at the watermark — the "
            "policy a 100 TB deployment runs; its throughput parity "
            "with global dedup (whose state is strictly larger — see "
            "the state-rows column) shows state-size, not "
            "state-policy, is the cost driver at this scale. It emits "
            "FEWER rows than global dedup because file-source batches "
            "arrive unordered in event time, so rows older than the "
            "advancing watermark drop as late data — correct streaming "
            "semantics, not a dedup difference. The hourly-stats "
            "window holds one row per open (bucket, type) group; the "
            "per-product allocation's state is one row per product "
            "seen, growing to the product-catalog size and no further "
            "— but its throughput is bounded by per-GROUP overhead "
            "(one pandas invocation per product per batch at ~3 "
            "rows/group), which is why the bucket-keyed form exists: "
            "64 state rows carrying (products, remaining) stock "
            "vectors, one vectorized batch-kernel scan per bucket per "
            "batch — identical results (pinned in "
            "tests/test_streaming.py), state rows = bucket count. The "
            "stream-stream interval join buffers BOTH sides keyed; the "
            "time bound expires both buffers — the property that keeps "
            "a stream-stream join finite at 100 TB. The CDC "
            "merge-upsert's state is a parquet warehouse table (the "
            "full-outer reconciliation a Delta MERGE lowers to, "
            "batch-id-ledgered for at-least-once replay); its state "
            "columns report the table itself, rewritten IN FULL per "
            "batch. The PARTITIONED form (streaming/cdc.py) is the "
            "at-scale fix: hash-bucketed warehouse files committed "
            "atomically through the table log (the log doubles as the "
            "idempotence ledger), so a micro-batch rewrites only the "
            "buckets its keys hash into — its rewrite fractions above "
            "are means over the 11 CDC-shaped trickle batches (seed "
            "batch excluded), vs 1.0 per batch for the full rewrite; "
            "untouched bucket files keep their inodes (pinned in "
            "tests/test_cdc.py) and its state upd/batch column is "
            "ROWS REWRITTEN per trickle batch, not table size.\n"
        )
        p = results.get("streaming_cdc_merge_partitioned", {})
        if p:
            f.write(
                f"\nPartitioned-CDC rewrite volume: mean "
                f"{p['rewrite_frac_files_mean']:.2%} of files / "
                f"{p['rewrite_frac_rows_mean']:.2%} of rows per trickle "
                f"batch ({p['trickle_batches']} trickle batches, 1024 "
                "buckets) — the full-rewrite sink rewrites 100% of "
                "both every batch.\n"
            )
        s = results.get("streaming_cdc_merge_partitioned_saturated", {})
        if s:
            f.write(
                "The SATURATED partitioned-CDC row feeds the same "
                "sink 12 equal-volume batches each covering ~8% of "
                "the key space (full input volume, not trickles), "
                "making its rows/s directly comparable to the "
                "full-rewrite sink's — and it LOSES there: "
                f"{s['sustained_rows_per_sec']} rows/s while "
                f"rewriting a mean {s['rewrite_frac_files_mean']:.1%} "
                f"of files / {s['rewrite_frac_rows_mean']:.1%} of rows "
                "per batch (~1,250 touched keys hash into ~70% of the "
                "1024 one-bucket files, so each batch pays ~730 "
                "per-bucket file rewrites where the full-rewrite sink "
                "pays one bulk write). That is the honest crossover: "
                "a batch touching K keys rewrites ~n/bpf * "
                "(1 - exp(-K*bpf/n)) file groups, so the layout pays "
                "only while K*bpf << n — trickle-shaped batches "
                "(the 1.45%-of-files row above) — and at ~10% key "
                "coverage even bpf=8 (128 groups) would saturate "
                "every group; there, switch to the full-rewrite sink "
                "or coarsen n_buckets toward the batch key coverage.\n"
            )
        c = p.get("compaction") if p else None
        if c:
            f.write(
                "Layout compaction (compact_warehouse, one atomic "
                f"commit): {c['files_fine']} one-bucket files -> "
                f"{c['files_coarse']} eight-bucket group files; a "
                "post-compaction trickle through a restarted sink "
                f"rewrites {c['post_rewrite_frac_files']:.2%} of files "
                f"/ {c['post_rewrite_frac_rows']:.2%} of rows — the "
                "explicit file-count vs rewrite-amplification trade, "
                "tunable per table via buckets_per_file.\n"
            )
        rt = results.get("streaming_cdc_merge_routed_trickle", {})
        rs = results.get("streaming_cdc_merge_routed_saturated", {})
        if rt and rs:
            f.write(
                "\nThe COVERAGE-ROUTED sink (make_routed_cdc_sink) "
                "closes the crossover as a per-batch decision instead "
                "of an operator's manual one. Trickle regime: routes "
                f"{rt['routes']}, {rt['sustained_rows_per_sec']} "
                "rows/s rewriting a mean "
                f"{rt['rewrite_frac_files_mean']:.2%} of files per "
                "trickle batch — it stayed partitioned and matches "
                "the pure partitioned sink. Saturated regime: routes "
                f"{rs['routes']}, {rs['sustained_rows_per_sec']} "
                "rows/s — after the first over-crossover batch it "
                "full-rewrites at bulk grouping "
                f"({rs['files_final']} files final), recovering the "
                "bulk sink's economics where the pure partitioned "
                "form lost 20x.\n"
            )
        rr = results.get("streaming_cdc_merge_roundtrip", {})
        if rr:
            f.write(
                "\nThe coarsening is a ROUND TRIP (refine_after=3 "
                "hysteresis): trickles over the fine layout rewrote "
                f"{rr['trickle_frac_fine_pre']:.2%} of files; a "
                "saturating batch full-rewrote the table down to "
                f"{rr['files_after_coarsen']} bulk files, where the "
                "same trickles cost "
                f"{rr['trickle_frac_coarse']:.2%} of files each; after "
                "3 consecutive partitioned-routed batches over that "
                "coarsened layout the sink re-fined ITSELF (route "
                f"'refine' — one whole-table rewrite back to 1 "
                f"bucket/file inside the batch's atomic commit; "
                f"routes {rr['routes']}, {rr['files_final']} files "
                "final) — and the post-refine trickles rewrite "
                f"{rr['trickle_frac_fine_post']:.2%} of files, "
                "recovering fine-layout economics with no manual "
                "compact_warehouse. The round trip's table row "
                "reports the post-refine trickles.\n"
            )
        section = f.getvalue()
    from bench import splice_section
    with open(md_path) as f:
        existing = f.read()
    with open(md_path, "w") as f:
        f.write(splice_section(existing, header, section))
    print(json.dumps({"metric": "streaming_throughput", **results,
                      "ambient_load_1m": round(ambient, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
