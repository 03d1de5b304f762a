"""Round-12 queries: the BATCH face of range serving (N probes
amortized over one metadata resolve + one scan) and the stats-coverage
maintenance loop made actionable (route-ledger hysteresis ->
maintenance_due -> compact -> cleared), as oracled regime rows.

Same router-oracle design rule as rounds 10/11 (``plans/round10.py``):
fixtures pin each regime deep inside its region so the route is
deterministic, the route/evidence flags are hash-checked output
columns, and the VALUES next to them are recomputed by the oracle from
the raw relations — a router that picks the wrong strategy, or a
strategy that returns wrong rows, fails the same gate.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table_log as tl
from ..sources.tpch import load_table
from .registry import register

# ---------------------------------------------------------------------------
# serve_range_batch: N range probes, ONE resolve, ONE union scan
# ---------------------------------------------------------------------------

#: all three ranges are non-empty at every driver SF (documents ids
#: start at 0 and sf0.001 already has >45 docs), and the first two
#: OVERLAP IN FILES on the 6-file clustered layout at every SF — the
#: condition under which the batch face's union scan provably opens
#: fewer files than three independent probes would
_BATCH_RANGES = [(5, 20), (10, 30), (35, 45)]

_BATCH_ORACLE = """
SELECT CAST(r.range_id AS BIGINT) AS range_id,
       'stats-pruned' AS route,
       TRUE AS amortized,
       TRUE AS pruned,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(d.doc_id) AS BIGINT) AS min_id,
       CAST(MAX(d.doc_id) AS BIGINT) AS max_id
FROM (VALUES (0, 5, 20), (1, 10, 30), (2, 35, 45)) r(range_id, lo, hi)
JOIN documents d ON d.doc_id BETWEEN r.lo AND r.hi
GROUP BY r.range_id
ORDER BY range_id
"""


@register(
    "serve_range_batch_amortized",
    oracle=_BATCH_ORACLE,
    doc="serve_range_batch() over the range-clustered serving table: "
    "three range probes pay ONE checkpoint-load + tail-replay and ONE "
    "union scan (rows tagged by range_id through a broadcast range "
    "join) instead of three resolves + three scans — the same "
    "amortization ann_ivf_index_batch applies to IVF probes, and the "
    "shape that matters at serving QPS. Hash-checked evidence columns: "
    "route (stats-pruned — every live file carries committed [min, "
    "max]), amortized (union files_scanned STRICTLY below the sum of "
    "per-probe kept lists — the first two ranges share a file by "
    "construction), pruned (union still below the live total). The "
    "per-range aggregates are recomputed by the oracle from the raw "
    "table via the same VALUES ranges, so a mis-tagged or lossy union "
    "fails the gate.",
    tags=("table_log", "serving", "router", "pruning", "batch"),
)
def serve_range_batch_amortized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import serve_range_batch
    from ..sources.scratch import content_fingerprint, ensure_scratch

    src = os.path.join(sf_dir, "documents.parquet")
    # same fixture recipe as serve_range_pruned (round 11) but its own
    # scratch key: regime fixtures stay independently reclaimable
    key = content_fingerprint(src, extra="serverange-sorted")
    root = os.path.join(tempfile.gettempdir(), f"csetl_srvrngb_{key}")
    t = os.path.join(root, "docs")

    def _intact(d: str) -> bool:
        td = os.path.join(d, "docs")
        if tl.current_version(td) != 1:  # v0 append + v1 compact
            return False
        return all(os.path.exists(p) for p in tl.snapshot_files(td))

    def _build(stage: str) -> None:
        td = os.path.join(stage, "docs")
        tl.append(load_table(spark, sf_dir, "documents"), td)
        tl.compact(
            spark, td, target_files=6, sort_by="doc_id",
            stats_cols=["doc_id"],
        )

    ensure_scratch(root, _build, _intact)
    # record_routes=False: shared regime fixture stays byte-stable
    df, info = serve_range_batch(
        spark, t, "doc_id", _BATCH_RANGES, record_routes=False
    )
    return (
        df.groupBy("range_id")
        .agg(
            F.lit(info["route"]).alias("route"),
            F.lit(
                info["files_scanned"]
                < info["files_scanned_per_probe_sum"]
            ).alias("amortized"),
            F.lit(info["files_scanned"] < info["files_total"]).alias(
                "pruned"
            ),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .select(
            "range_id", "route", "amortized", "pruned",
            "n_docs", "total_chars", "min_id", "max_id",
        )
        .orderBy("range_id")
    )


# ---------------------------------------------------------------------------
# The maintenance loop as a round trip: streak -> hint -> compact -> cleared
# ---------------------------------------------------------------------------

_MAINT_ORACLE = """
WITH probe AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents WHERE doc_id BETWEEN 10 AND 40
),
full_t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents
)
SELECT p.phase, p.route, p.due, p.streak, a.n_docs, a.total_chars
FROM (VALUES
        (CAST(1 AS BIGINT), 'full-scan',    FALSE, CAST(1 AS BIGINT), 'probe'),
        (CAST(2 AS BIGINT), 'full-scan',    FALSE, CAST(2 AS BIGINT), 'probe'),
        (CAST(3 AS BIGINT), 'full-scan',    TRUE,  CAST(3 AS BIGINT), 'probe'),
        (CAST(4 AS BIGINT), 'maintenance',  FALSE, CAST(3 AS BIGINT), 'full'),
        (CAST(5 AS BIGINT), 'stats-pruned', FALSE, CAST(0 AS BIGINT), 'probe')
     ) p(phase, route, due, streak, agg_src)
JOIN (
  SELECT 'probe' AS agg_src, n_docs, total_chars FROM probe
  UNION ALL
  SELECT 'full', n_docs, total_chars FROM full_t
) a USING (agg_src)
ORDER BY p.phase
"""


@register(
    "serve_range_maintenance_roundtrip",
    oracle=_MAINT_ORACLE,
    doc="The stats-coverage maintenance loop, closed and hash-checked "
    "end-to-end: a stats-less table serves three identical range "
    "probes, each FULL-SCAN-routed and recorded in the table's serving "
    "ledger (a side table-log — reads never contend with the table's "
    "writers); after the third, maintenance_due() trips (streak 3 AND "
    "coverage still below threshold) and the probe's own info carries "
    "the compact(sort_by, stats_cols) prescription. Phase 4 runs "
    "exactly that compact: the hint clears IMMEDIATELY (coverage now "
    "1.0 — no waiting for the next probe), verified against the FULL "
    "table's aggregates. Phase 5 re-probes: route stats-pruned, ledger "
    "streak reset to 0. Every phase row carries the route, the due "
    "flag, the ledger streak, and aggregates the oracle recomputes "
    "from the raw relation. The ephemeral per-run table makes the "
    "ledger history deterministic at every SF and every rerun.",
    tags=("table_log", "serving", "maintenance", "router"),
)
def serve_range_maintenance_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import maintenance_due, serve_range

    root = tempfile.mkdtemp(prefix="csetl_srvmnt_")
    t = os.path.join(root, "docs")
    rows = []
    try:
        tl.append(load_table(spark, sf_dir, "documents"), t)  # no stats
        for phase in (1, 2, 3):
            df, info = serve_range(spark, t, "doc_id", 10, 40)
            agg = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("c"),
            ).first()
            due = maintenance_due(t, "doc_id")
            rows.append((
                phase, info["route"], due["due"],
                due["full_scan_streak"], agg["n"], agg["c"],
            ))
        # phase 3's own serving info must carry the prescription
        assert "compact" in info.get("maintenance_hint", ""), info
        tl.compact(
            spark, t, target_files=6, sort_by="doc_id",
            stats_cols=["doc_id"],
        )
        due = maintenance_due(t, "doc_id")
        full = (
            tl.read_snapshot(spark, t)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("c"),
            )
            .first()
        )
        rows.append((
            4, "maintenance", due["due"], due["full_scan_streak"],
            full["n"], full["c"],
        ))
        df, info = serve_range(spark, t, "doc_id", 10, 40)
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("c"),
        ).first()
        due = maintenance_due(t, "doc_id")
        rows.append((
            5, info["route"], due["due"], due["full_scan_streak"],
            agg["n"], agg["c"],
        ))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "phase long, route string, due boolean, streak long, "
        "n_docs long, total_chars long",
    ).orderBy("phase")


# ---------------------------------------------------------------------------
# Committed bloom sketches: membership pruning on an unclustered column
# ---------------------------------------------------------------------------

#: probe sets and their EXPECTED kept-file counts on the 6-slice
#: layout (slice g = srcN's N % 6): src3 -> slice 3 alone; src5/src8
#: -> slices 5 and 2; an absent source prunes everything. The counts
#: are exact, not probabilistic, at these fixture sizes: each file's
#: bitmap is >= 8192 bits for <= ~900 rows (16 bits/row floor), so a
#: single-value false positive is ~1e-6 — and the fixture content per
#: SF is fixed, making the outcome deterministic (verified at sf0.001
#: /0.01/0.1 when this query landed).
_BLOOM_PROBES = [
    (1, ["src3"], 1),
    (2, ["src5", "src8"], 2),
    (3, ["src-absent"], 0),
]

_BLOOM_ORACLE = """
SELECT p.phase,
       'bloom-pruned' AS route,
       CAST(p.files AS BIGINT) AS files_scanned,
       CAST(6 AS BIGINT) AS files_total,
       CAST(COUNT(d.doc_id) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS total_chars
FROM (VALUES
        (CAST(1 AS BIGINT), ['src3'], 1),
        (CAST(2 AS BIGINT), ['src5', 'src8'], 2),
        (CAST(3 AS BIGINT), ['src-absent'], 0)
     ) p(phase, probes, files)
LEFT JOIN documents d ON list_contains(p.probes, d.source)
GROUP BY p.phase, p.files
ORDER BY p.phase
"""


@register(
    "serve_point_bloom_pruned",
    oracle=_BLOOM_ORACLE,
    doc="serve() routing point probes through COMMITTED BLOOM "
    "SKETCHES — the pruning class [min, max] stats cannot provide: "
    "the fixture slices documents into 6 files by source-number % 6 "
    "and commits ONLY per-file bloom bitmaps for `source` (no range "
    "stats, no bucket spec — a range test or hash layout has nothing "
    "to prune with), so the router's bloom-coverage check is the only "
    "thing standing between a probe and a 6-file scan. Three probes, "
    "each a hash-checked row: a single present source opens exactly "
    "its own slice (files_scanned = 1 of 6), a two-source probe "
    "unions two slices (2 of 6), and an ABSENT source opens nothing "
    "(0 of 6) — the empty result still shaped by the committed "
    "schema. n_docs/total_chars are recomputed by the oracle from the "
    "raw relation per probe set, so a lossy bitmap, a mis-hashed "
    "probe, or a router that scans anyway all fail the same gate. At "
    "100 TB this is Delta's bloom-filter-index / Iceberg-puffin role "
    "carried by the commit entry: equality serving on an unclustered "
    "column costs O(matching files) + one driver-folded probe-hash "
    "evaluation (zero Spark jobs), with "
    "planning from log metadata alone (zero index I/O).",
    tags=("table_log", "serving", "router", "pruning", "bloom"),
)
def serve_point_bloom_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import serve
    from ..sources.scratch import content_fingerprint, ensure_scratch

    src = os.path.join(sf_dir, "documents.parquet")
    key = content_fingerprint(src, extra="bloom-source-6slice")
    root = os.path.join(tempfile.gettempdir(), f"csetl_srvblm_{key}")
    t = os.path.join(root, "docs")

    def _intact(d: str) -> bool:
        td = os.path.join(d, "docs")
        if tl.current_version(td) != 5:  # 6 per-slice appends
            return False
        stats = tl.snapshot_file_stats(td)
        if len(stats) != 6 or any(
            "source" not in e.get("bloom", {}) for e in stats.values()
        ):
            return False
        return all(os.path.exists(p) for p in tl.snapshot_files(td))

    def _build(stage: str) -> None:
        td = os.path.join(stage, "docs")
        docs = load_table(spark, sf_dir, "documents")
        g = F.pmod(
            F.substring("source", 4, 10).cast("long"), F.lit(6)
        )
        for i in range(6):
            tl.append(
                docs.where(g == i).coalesce(1),
                td,
                bloom_cols=["source"],
                op=f"slice-{i}",
            )

    ensure_scratch(root, _build, _intact)
    # routing metadata (route, files counts) is driver-resolved per
    # probe with zero jobs; the per-phase aggregates stay LAZY and
    # union into ONE plan, so the whole 3-phase query runs as one
    # Spark job instead of one collect per phase (r12: 3 jobs -> 1)
    parts = []
    for phase, probes, _ in _BLOOM_PROBES:
        # record_routes=False: shared regime fixture stays byte-stable
        df, info = serve(
            spark, t, probes, key_col="source", record_routes=False
        )
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.coalesce(F.sum("n_chars"), F.lit(0))
                .cast("long")
                .alias("total_chars"),
            ).select(
                F.lit(phase).cast("long").alias("phase"),
                F.lit(info["route"]).alias("route"),
                F.lit(info["files_scanned"]).cast("long").alias(
                    "files_scanned"
                ),
                F.lit(info["files_total"]).cast("long").alias("files_total"),
                "n_docs",
                "total_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("phase")


# ---------------------------------------------------------------------------
# add_bloom_index: retrofit membership pruning onto a BUCKETED layout
# ---------------------------------------------------------------------------

_OFFKEY_ORACLE = """
SELECT p.phase,
       'bloom-pruned' AS route,
       TRUE AS pruned,
       TRUE AS tight,
       CAST(COUNT(d.o_orderkey) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CAST(FLOOR(d.o_totalprice * 100 + 0.5)
                              AS BIGINT)), 0) AS BIGINT) AS cents
FROM (VALUES
        (CAST(1 AS BIGINT), [577]),
        (CAST(2 AS BIGINT), [33, 901]),
        (CAST(3 AS BIGINT), [99999999])
     ) p(phase, probes)
LEFT JOIN orders d ON list_contains(p.probes, d.o_orderkey)
GROUP BY p.phase
ORDER BY p.phase
"""


@register(
    "serve_offkey_bloom_indexed",
    oracle=_OFFKEY_ORACLE,
    doc="add_bloom_index retrofitting membership pruning onto a "
    "BUCKETED table — the secondary-key lookup a hash layout cannot "
    "serve: orders bucketed by o_custkey (24 one-bucket files), then "
    "indexed IN PLACE on o_orderkey by a stats-only commit (add/"
    "remove empty, dataChange false — zero data rewritten, which is "
    "the only fix a bucketed layout can take without destroying its "
    "b#####-file grouping, and the only fix anyone schedules at 100 "
    "TB). Off-key probes that previously scan-off-key-routed now "
    "route bloom-pruned: each orderkey lives in exactly its owning "
    "customer's bucket file, so files_scanned is bounded by the "
    "PROBE COUNT (hash-checked as tight = files_scanned <= probes "
    "per phase), never the bucket count — and an absent key opens "
    "zero files. n_rows/cents recomputed by the oracle from the raw "
    "relation per probe set. This is Delta's canonical bloom-index "
    "case (point lookup on a high-cardinality non-partition column) "
    "expressed through the commit log.",
    tags=("table_log", "serving", "router", "pruning", "bloom"),
)
def serve_offkey_bloom_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import serve, write_bucketed
    from ..sources.scratch import content_fingerprint, ensure_scratch

    src = os.path.join(sf_dir, "orders.parquet")
    key = content_fingerprint(src, extra="bloom-offkey-24b")
    root = os.path.join(tempfile.gettempdir(), f"csetl_srvobk_{key}")
    t = os.path.join(root, "orders")

    def _intact(d: str) -> bool:
        td = os.path.join(d, "orders")
        if tl.current_version(td) != 1:  # v0 bucketed + v1 index
            return False
        stats = tl.snapshot_file_stats(td)
        if len(stats) != 24 or any(
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
            orders, td, key_col="o_custkey", n_buckets=24
        )
        tl.add_bloom_index(spark, td, ["o_orderkey"])

    ensure_scratch(root, _build, _intact)
    # lazily-unioned per-phase aggregates: one Spark job for all three
    # probes instead of one collect per phase (routing metadata is
    # driver-resolved with zero jobs — see serve_point_bloom_pruned)
    parts = []
    for phase, probes in ((1, [577]), (2, [33, 901]), (3, [99999999])):
        # record_routes=False: shared regime fixture stays byte-stable
        df, info = serve(
            spark, t, probes, key_col="o_orderkey",
            record_routes=False,
        )
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(
                        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                        .cast("long")
                    ),
                    F.lit(0),
                ).cast("long").alias("cents"),
            ).select(
                F.lit(phase).cast("long").alias("phase"),
                F.lit(info["route"]).alias("route"),
                F.lit(
                    info["files_scanned"] < info["files_total"]
                ).alias("pruned"),
                F.lit(
                    info["files_scanned"] <= len(probes)
                ).alias("tight"),
                "n_rows",
                "cents",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("phase")


# ---------------------------------------------------------------------------
# Zero-copy clone: branch a snapshot, serve it with the carried metadata
# ---------------------------------------------------------------------------

_CLONE_ORACLE = """
WITH full_t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents
),
rng AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents WHERE doc_id BETWEEN 10 AND 40
)
SELECT p.phase, p.what, TRUE AS ok, a.n_docs, a.total_chars
FROM (VALUES
        (CAST(1 AS BIGINT), 'clone-read-zero-copy', 'full'),
        (CAST(2 AS BIGINT), 'stats-pruned',         'rng'),
        (CAST(3 AS BIGINT), 'bloom-pruned',         'none')
     ) p(phase, what, agg_src)
JOIN (
  SELECT 'full' AS agg_src, n_docs, total_chars FROM full_t
  UNION ALL
  SELECT 'rng', n_docs, total_chars FROM rng
  UNION ALL
  SELECT 'none', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
) a USING (agg_src)
ORDER BY p.phase
"""


@register(
    "table_clone_branch",
    oracle=_CLONE_ORACLE,
    doc="clone_table: ZERO-COPY branching of a snapshot (the "
    "SHALLOW-CLONE role) — the clone is created per run by "
    "hardlinking the 6-file clustered+sketched source table and "
    "committing ONE metadata entry carrying schema, per-file [min, "
    "max] stats, bloom sketches, and the layout. Three hash-checked "
    "phases all run AGAINST THE CLONE: (1) a full read equals the "
    "raw relation with ok = every clone file sharing its source's "
    "inode (st_ino equality — the zero-copy claim, checked, not "
    "asserted in prose); (2) a range probe serve_range-routes "
    "stats-pruned with files actually pruned (the carried stats, not "
    "re-derived ones, plan the scan); (3) a membership probe for an "
    "ABSENT source routes bloom-pruned and opens ZERO files — only "
    "the carried sketches can prove that (on this doc_id-clustered "
    "layout every file holds every present source, so range stats "
    "prove nothing about membership). Immutable data files "
    "make inode sharing safe; vacuum on either side unlinks only its "
    "own name (POSIX link counts are the cross-table refcount). At "
    "100 TB this makes 'branch the warehouse for an experiment' a "
    "metadata operation instead of a day of I/O.",
    tags=("table_log", "clone", "serving", "pruning", "bloom"),
)
def table_clone_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.colocated import serve, serve_range
    from ..sources.scratch import content_fingerprint, ensure_scratch

    src_parquet = os.path.join(sf_dir, "documents.parquet")
    key = content_fingerprint(src_parquet, extra="clone-src-6f")
    root = os.path.join(tempfile.gettempdir(), f"csetl_clnsrc_{key}")
    src = os.path.join(root, "docs")

    def _intact(d: str) -> bool:
        td = os.path.join(d, "docs")
        if tl.current_version(td) != 1:  # v0 append + v1 compact
            return False
        stats = tl.snapshot_file_stats(td)
        if len(stats) != 6 or any(
            "source" not in e.get("bloom", {})
            or "doc_id" not in e.get("cols", {})
            for e in stats.values()
        ):
            return False
        return all(os.path.exists(p) for p in tl.snapshot_files(td))

    def _build(stage: str) -> None:
        td = os.path.join(stage, "docs")
        tl.append(load_table(spark, sf_dir, "documents"), td)
        tl.compact(
            spark, td, target_files=6, sort_by="doc_id",
            stats_cols=["doc_id"], bloom_cols=["source"],
        )

    ensure_scratch(root, _build, _intact)
    croot = tempfile.mkdtemp(prefix="csetl_clone_")
    clone = os.path.join(croot, "branch")
    rows = []

    def _agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"),
        ).first()

    try:
        tl.clone_table(src, clone)
        zero_copy = all(
            os.stat(p).st_ino
            == os.stat(os.path.join(src, os.path.basename(p))).st_ino
            for p in tl.snapshot_files(clone)
        )
        full = _agg(tl.read_snapshot(spark, clone))
        rows.append((
            1, "clone-read-zero-copy", zero_copy, full["n"], full["c"],
        ))
        df, info = serve_range(
            spark, clone, "doc_id", 10, 40, record_routes=False
        )
        agg = _agg(df)
        rows.append((
            2, info["route"],
            info["files_scanned"] < info["files_total"],
            agg["n"], agg["c"],
        ))
        df, info = serve(
            spark, clone, ["src-absent"], key_col="source",
            record_routes=False,
        )
        agg = _agg(df)
        rows.append((
            3, info["route"],
            info["files_scanned"] == 0,
            agg["n"], agg["c"],
        ))
    finally:
        shutil.rmtree(croot, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "phase long, what string, ok boolean, n_docs long, "
        "total_chars long",
    ).orderBy("phase")


# ---------------------------------------------------------------------------
# The point-probe maintenance loop: scan streak -> bloom_cols -> cleared
# ---------------------------------------------------------------------------

_PMAINT_ORACLE = """
WITH probe AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents WHERE source = 'src3'
),
full_t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents
)
SELECT p.phase, p.route, p.due, p.streak, p.pruned,
       a.n_docs, a.total_chars
FROM (VALUES
        (CAST(1 AS BIGINT), 'scan-unbucketed', FALSE,
         CAST(1 AS BIGINT), FALSE, 'probe'),
        (CAST(2 AS BIGINT), 'scan-unbucketed', FALSE,
         CAST(2 AS BIGINT), FALSE, 'probe'),
        (CAST(3 AS BIGINT), 'scan-unbucketed', TRUE,
         CAST(3 AS BIGINT), FALSE, 'probe'),
        (CAST(4 AS BIGINT), 'maintenance',     FALSE,
         CAST(3 AS BIGINT), FALSE, 'full'),
        (CAST(5 AS BIGINT), 'bloom-pruned',    FALSE,
         CAST(0 AS BIGINT), TRUE,  'probe'),
        (CAST(6 AS BIGINT), 'bloom-pruned',    FALSE,
         CAST(0 AS BIGINT), TRUE,  'none')
     ) p(phase, route, due, streak, pruned, agg_src)
JOIN (
  SELECT 'probe' AS agg_src, n_docs, total_chars FROM probe
  UNION ALL
  SELECT 'full', n_docs, total_chars FROM full_t
  UNION ALL
  SELECT 'none', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
) a USING (agg_src)
ORDER BY p.phase
"""


@register(
    "serve_point_maintenance_roundtrip",
    oracle=_PMAINT_ORACLE,
    doc="The MEMBERSHIP maintenance loop, closed end-to-end — the "
    "point-probe twin of serve_range_maintenance_roundtrip: a "
    "sketch-less table serves three identical source probes, each "
    "scan-routed (no bucket spec, no bloom — nothing can prune) and "
    "recorded in the serving ledger under kind=point, so range "
    "probes on the same column can never trip it; after the third, "
    "membership_maintenance_due() flips (scan streak 3 AND bloom "
    "coverage under threshold) and the probe's own info carries the "
    "bloom_cols prescription. Phase 4 runs exactly that compact "
    "(sort_by + bloom_cols): the hint clears IMMEDIATELY (coverage "
    "1.0), verified against the full table's aggregates. Phases 5-6 "
    "re-probe: a present source routes bloom-pruned with files "
    "actually pruned, an ABSENT source opens zero files — and the "
    "ledger streak is reset by the pruned route. Every row carries "
    "route, due flag, ledger streak, a pruning outcome, and "
    "aggregates the oracle recomputes from the raw relation. The "
    "ephemeral per-run table keeps the ledger history deterministic "
    "at every SF and rerun.",
    tags=("table_log", "serving", "maintenance", "router", "bloom"),
)
def serve_point_maintenance_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import membership_maintenance_due, serve

    root = tempfile.mkdtemp(prefix="csetl_srvpmnt_")
    t = os.path.join(root, "docs")
    rows = []

    def _agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"),
        ).first()

    try:
        tl.append(load_table(spark, sf_dir, "documents"), t)  # no sketch
        for phase in (1, 2, 3):
            df, info = serve(spark, t, ["src3"], key_col="source")
            agg = _agg(df)
            due = membership_maintenance_due(t, "source")
            rows.append((
                phase, info["route"], due["due"], due["scan_streak"],
                info["files_scanned"] < info["files_total"],
                agg["n"], agg["c"],
            ))
        # phase 3's own serving info must carry the prescription
        assert "bloom" in info.get("maintenance_hint", ""), info
        tl.compact(
            spark, t, target_files=6, sort_by="source",
            bloom_cols=["source"],
        )
        due = membership_maintenance_due(t, "source")
        full = _agg(tl.read_snapshot(spark, t))
        rows.append((
            4, "maintenance", due["due"], due["scan_streak"], False,
            full["n"], full["c"],
        ))
        for phase, probe in ((5, "src3"), (6, "src-absent")):
            df, info = serve(spark, t, [probe], key_col="source")
            agg = _agg(df)
            due = membership_maintenance_due(t, "source")
            rows.append((
                phase, info["route"], due["due"], due["scan_streak"],
                info["files_scanned"] < info["files_total"],
                agg["n"], agg["c"],
            ))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "phase long, route string, due boolean, streak long, "
        "pruned boolean, n_docs long, total_chars long",
    ).orderBy("phase")


# ---------------------------------------------------------------------------
# Manifest checkpointing: cold chain resolve is O(tail), hash-checked
# ---------------------------------------------------------------------------

#: 12 publishes + the init commit = manifest v12; the auto-checkpoint
#: rides at v10, so a cold resolve seeds there and replays exactly 2
#: tail entries — deterministic at every SF (the batch COUNT is fixed;
#: only the rows per batch scale)
_CKPT_ORACLE = """
SELECT TRUE  AS checkpoint_seeded,
       CAST(10 AS BIGINT) AS checkpoint_version,
       CAST(2  AS BIGINT) AS entries_replayed,
       CAST(13 AS BIGINT) AS versions_total,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
       CAST(MIN(doc_id) AS BIGINT)   AS min_id,
       CAST(MAX(doc_id) AS BIGINT)   AS max_id
FROM documents
"""


@register(
    "manifest_checkpoint_resolve",
    oracle=_CKPT_ORACLE,
    doc="Cold-start manifest resolution through the checkpoint fold: "
    "a 12-batch published chain (one member table, batches sliced by "
    "doc_id % 12, one manifest publish each) is resolved by a fresh "
    "process via manifest_resolve_info — seeding from the newest "
    "fold-carrying checkpoint (auto-ridden at manifest v10) and "
    "replaying ONLY the 2 tail entries instead of all 13. Both "
    "resolve-cost facts are hash-checked literals (checkpoint_version "
    "= 10, entries_replayed = 2 < versions_total = 13). The fixture "
    "also appends a 13th member version that NO manifest entry "
    "references (a crashed batch's dangler): read_published over the "
    "checkpoint-seeded lists must reproduce the documents table "
    "EXACTLY — the oracle recomputes n_docs/total_chars/min/max from "
    "the raw relation, so a fold that loses a published version OR "
    "lets the dangler leak double-counts rows and fails the gate. At "
    "100 TB this is the difference between a chain whose resolve cost "
    "is O(publishes ever) and one that stays O(checkpoint interval) "
    "after years of ingest.",
    tags=("table_log", "manifest", "checkpoint", "incremental"),
)
def manifest_checkpoint_resolve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.scratch import content_fingerprint, ensure_scratch

    src = os.path.join(sf_dir, "documents.parquet")
    key = content_fingerprint(src, extra="manifest-ckpt-v1")
    root = os.path.join(tempfile.gettempdir(), f"csetl_manckpt_{key}")
    man = os.path.join(root, "manifest")
    member = os.path.join(root, "docs")

    def _intact(d: str) -> bool:
        # manifest: init + 12 publishes; member: 12 published appends
        # + 1 dangler — and the dangler must still be UNPUBLISHED
        if tl.current_version(os.path.join(d, "manifest")) != 12:
            return False
        if tl.current_version(os.path.join(d, "docs")) != 12:
            return False
        pub = tl.manifest_published(os.path.join(d, "manifest"))
        if sorted(pub.get("docs", [])) != list(range(12)):
            return False
        return all(
            os.path.exists(p)
            for p in tl.snapshot_files(os.path.join(d, "docs"))
        )

    def _build(stage: str) -> None:
        m = os.path.join(stage, "manifest")
        t = os.path.join(stage, "docs")
        docs = load_table(spark, sf_dir, "documents")
        tl.manifest_init(m)
        for i in range(12):
            v = tl.append(
                docs.filter(F.pmod(F.col("doc_id"), F.lit(12)) == i), t
            )
            tl.manifest_publish(
                m, {"docs": v}, op=f"batch-{i}",
                base_version=tl.current_version(m),
            )
        # the dangler: a crashed batch's member append that never
        # reached the manifest — must stay invisible to chain readers
        tl.append(docs.filter(F.col("doc_id") < 1_000_000), t)

    ensure_scratch(root, _build, _intact)
    info = tl.manifest_resolve_info(man)
    pub = tl.manifest_published(man)
    df = tl.read_published(spark, member, pub["docs"])
    return df.agg(
        F.lit(info["checkpoint_version"] is not None).alias(
            "checkpoint_seeded"
        ),
        F.lit(info["checkpoint_version"]).cast("long").alias(
            "checkpoint_version"
        ),
        F.lit(info["entries_replayed"]).cast("long").alias(
            "entries_replayed"
        ),
        F.lit(info["versions_total"]).cast("long").alias(
            "versions_total"
        ),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
