"""Round-9 queries: the LIVE CDC warehouse as a co-located join side
(stream-then-join end-to-end), and the engine-native bucketed write
path producing storage-partitioned-join-ready tables straight from
``df.write.format("table_log")``.

Reference parity hooks: the reference's pipeline re-reads and
re-shuffles its stores on every run (`/root/reference/src/
data_processor.py`); here a continuously-merged warehouse is ALSO a
zero-shuffle join side, because the streaming sink publishes its
bucket spec + schema through the same commit log the join planner
reads. The native-writer row closes the loop the other way: a table
written through the ordinary ``df.write`` face comes out with the
same co-location contract as the library path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register
from .round8 import (
    _COLOC_ORACLE,
    _coloc_segment_rollup,
    _ensure_colocated_tables,
)

_CDC_BUCKETS = 16
_FEED_FILES = 4


def _ensure_cdc_warehouse(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, content-keyed) the streamed warehouse fixture: the
    events table staged as ``_FEED_FILES`` parquet files and replayed
    through a REAL file-source micro-batch stream
    (maxFilesPerTrigger=1) into the partitioned CDC sink — one atomic
    merge commit per batch, bucket spec + schema published through the
    log by the sink itself — plus a user-tier dim written bucketed
    with the same spec. The final warehouse contents are
    batch-split-invariant (per-key sums of exact integers), so the
    fixture is deterministic even though the file order isn't."""
    from ..operators.colocated import write_bucketed
    from ..sources import table_log as tl
    from ..sources.scratch import content_fingerprint, ensure_scratch
    from ..streaming.cdc import make_partitioned_cdc_sink
    from ..streaming.events import run_stream_foreach_batch

    key = content_fingerprint(
        os.path.join(sf_dir, "events.parquet"), extra="cdcwh"
    )
    root = os.path.join(tempfile.gettempdir(), f"csetl_cdcwh_{key}")

    def _data_batches(table_dir: str) -> int:
        return sum(
            1
            for e in tl.log_entries(table_dir)
            if e["op"].startswith("cdc-batch-") and e["add"]
        )

    def _intact(d: str) -> bool:
        w, u = os.path.join(d, "warehouse"), os.path.join(d, "user_dim")
        if tl.current_version(w) is None or tl.current_version(u) != 0:
            return False
        if _data_batches(w) != _FEED_FILES:
            return False
        for t in (w, u):
            if not all(os.path.exists(p) for p in tl.snapshot_files(t)):
                return False
        return True

    def _build(stage: str) -> None:
        events = load_table(spark, sf_dir, "events")
        feed = os.path.join(stage, "feed")
        events.select("user_id", "value").repartition(
            _FEED_FILES
        ).write.parquet(feed)

        def increments(batch_df: DataFrame) -> DataFrame:
            return batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("cents"),
            )

        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        run_stream_foreach_batch(
            stream,
            make_partitioned_cdc_sink(
                os.path.join(stage, "warehouse"),
                increments,
                key_col="user_id",
                add_cols=("n_events", "cents"),
                n_buckets=_CDC_BUCKETS,
            ),
            checkpoint_dir=os.path.join(stage, "ckpt"),
        )
        dim = (
            events.select("user_id")
            .distinct()
            .select(
                "user_id",
                F.concat(
                    F.lit("tier"),
                    F.pmod(F.col("user_id"), F.lit(3)).cast("string"),
                ).alias("tier"),
            )
        )
        write_bucketed(
            dim, os.path.join(stage, "user_dim"),
            key_col="user_id", n_buckets=_CDC_BUCKETS,
        )

    ensure_scratch(root, _build, _intact)
    return root


@register(
    "cdc_warehouse_colocated_join",
    oracle=f"""
    WITH w AS (
      SELECT user_id, COUNT(*) AS n_events,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY user_id
    )
    SELECT 'tier' || CAST(user_id % 3 AS VARCHAR) AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST({_FEED_FILES} AS BIGINT) AS stream_batches
    FROM w GROUP BY 1 ORDER BY tier
    """,
    doc="STREAM-then-JOIN end-to-end: the events table replayed "
    "through a real micro-batch file stream (maxFilesPerTrigger=1) "
    "into the partitioned CDC merge-upsert sink — one atomic "
    "bucket-scoped commit per batch — and the LIVE warehouse then "
    "joined co-located (zero data shuffle) against a user-tier dim "
    "bucketed with the same committed spec, straight from the spec + "
    "schema the SINK itself published through the log. The oracle "
    "recomputes the per-tier rollup from raw events, so it verifies "
    "the whole chain: the micro-batch merges reconstructed the exact "
    "batch aggregate (additive integer merges are batch-split-"
    "invariant) AND the co-located join over the streamed layout "
    "equals the plain join; stream_batches pins that the warehouse "
    "was built by exactly 4 data-carrying merge commits, not one "
    "batch pass. At 100 TB this is the lakehouse serving shape: a "
    "trickle-merged warehouse that is ALWAYS a first-class SPJ side, "
    "no re-layout between ingest and serve.",
    tags=("streaming", "cdc", "table_log", "bucketed", "join"),
)
def cdc_warehouse_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.colocated import colocated_bucket_join
    from ..sources import table_log as tl

    root = _ensure_cdc_warehouse(spark, sf_dir)
    wh = os.path.join(root, "warehouse")
    n_batches = sum(
        1
        for e in tl.log_entries(wh)
        if e["op"].startswith("cdc-batch-") and e["add"]
    )
    joined = colocated_bucket_join(spark, wh, os.path.join(root, "user_dim"))
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
            F.sum("cents").alias("cents"),
        )
        .withColumn("stream_batches", F.lit(n_batches).cast("long"))
        .orderBy("tier")
    )


def _ensure_native_spj_tables(spark: SparkSession, sf_dir: str) -> str:
    """The round-8 (order_stats, cust_dim) pair, written through the
    ENGINE's DataSource writer instead of the library staging path."""
    from ..operators.colocated import write_bucketed_native
    from ..sources import table_log as tl
    from ..sources.scratch import content_fingerprint, ensure_scratch

    okey = content_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    ckey = content_fingerprint(os.path.join(sf_dir, "customer.parquet"))
    root = os.path.join(
        tempfile.gettempdir(), f"csetl_natspj_{okey}_{ckey}"
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
        write_bucketed_native(
            stats, os.path.join(stage, "order_stats"),
            key_col="cust_key", n_buckets=16,
        )
        write_bucketed_native(
            dim, os.path.join(stage, "cust_dim"),
            key_col="cust_key", n_buckets=16,
        )

    ensure_scratch(root, _build, _intact)
    return root


@register(
    "colocated_native_writer_join",
    oracle=_COLOC_ORACLE,
    doc="The colocated_customer_join result reproduced over tables "
    "written through the ENGINE's writer face — "
    "df.write.format('table_log').option('bucketBy', "
    "...).option('nBuckets', ...) — instead of the library staging "
    "path: tasks stream one durable parquet file per bucket directly "
    "into the table (bucket id computed JVM-side with the engine's "
    "own xxhash64 and carried to tasks as a stripped layout column), "
    "the driver folds every task's files into ONE atomic commit "
    "carrying the bucket spec + schema, and the committed table "
    "immediately plans the zero-data-shuffle storage-partitioned "
    "join. Same oracle as colocated_customer_join: two write paths, "
    "one layout contract, hash-identical results.",
    tags=("join", "table_log", "bucketed", "datasource"),
)
def colocated_native_writer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import colocated_bucket_join

    root = _ensure_native_spj_tables(spark, sf_dir)
    joined = colocated_bucket_join(
        spark,
        os.path.join(root, "order_stats"),
        os.path.join(root, "cust_dim"),
    )
    return _coloc_segment_rollup(joined)


@register(
    "colocated_left_join_coverage",
    oracle="""
    WITH s AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS spend_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN s.n_orders IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_without_orders,
           CAST(COALESCE(SUM(s.n_orders), 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(s.spend_cents), 0) AS BIGINT)
             AS spend_cents
    FROM customer c
    LEFT JOIN s ON s.o_custkey = c.c_custkey
    GROUP BY mktsegment
    ORDER BY mktsegment
    """,
    doc="LEFT-outer storage-partitioned join: the customer dim "
    "(left) against per-customer order stats, both bucketed on "
    "cust_key — customers with NO orders (a third of TPC-H custkeys) "
    "survive with the stats columns null-filled inside each bucket's "
    "Acero task, and the per-segment rollup counts them. The planner "
    "keeps every left-populated bucket group (a right-empty group "
    "still plans a task emitting left rows), unlike the inner form's "
    "matched-groups-only pruning — join semantics drive bucket-level "
    "task selection. Zero shuffle of table data either way; the "
    "oracle is the plain SQL LEFT JOIN + rollup.",
    tags=("join", "table_log", "bucketed", "outer"),
)
def colocated_left_join_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import colocated_bucket_join

    root = _ensure_colocated_tables(spark, sf_dir)
    joined = colocated_bucket_join(
        spark,
        os.path.join(root, "cust_dim"),
        os.path.join(root, "order_stats"),
        how="left",
    )
    return (
        joined.groupBy("mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(F.col("n_orders").isNull(), 1).otherwise(0)
            ).alias("n_without_orders"),
            F.coalesce(F.sum("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.sum("spend_cents"), F.lit(0)).alias(
                "spend_cents"
            ),
        )
        .orderBy("mktsegment")
    )


def _ensure_order_span_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-customer order-date span (days), bucketed under the SAME
    spec as the round-8 (order_stats, cust_dim) pair — co-location
    holds across tables from different builds because the spec (key,
    n, xxhash64) is the one shared definition."""
    from ..operators.colocated import write_bucketed
    from ..sources import table_log as tl
    from ..sources.scratch import content_fingerprint, ensure_scratch

    okey = content_fingerprint(
        os.path.join(sf_dir, "orders.parquet"), extra="span"
    )
    root = os.path.join(tempfile.gettempdir(), f"csetl_ospan_{okey}")

    def _intact(d: str) -> bool:
        t = os.path.join(d, "order_span")
        if tl.current_version(t) != 0:
            return False
        return all(os.path.exists(p) for p in tl.snapshot_files(t))

    def _build(stage: str) -> None:
        span = (
            load_table(spark, sf_dir, "orders")
            .groupBy(F.col("o_custkey").alias("cust_key"))
            .agg(
                F.datediff(
                    F.max(F.to_date("o_orderdate")),
                    F.min(F.to_date("o_orderdate")),
                ).alias("span_days")
            )
        )
        write_bucketed(
            span, os.path.join(stage, "order_span"),
            key_col="cust_key", n_buckets=16,
        )

    ensure_scratch(root, _build, _intact)
    return root


@register(
    "colocated_left_star_join",
    oracle="""
    WITH s AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ), t AS (
      SELECT o_custkey,
             DATEDIFF('day', MIN(CAST(o_orderdate AS DATE)),
                      MAX(CAST(o_orderdate AS DATE))) AS span_days
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN s.n_orders IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_without_orders,
           CAST(COALESCE(SUM(s.n_orders), 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(t.span_days), 0) AS BIGINT) AS span_days
    FROM customer c
    LEFT JOIN s ON s.o_custkey = c.c_custkey
    LEFT JOIN t ON t.o_custkey = c.c_custkey
    GROUP BY mktsegment
    ORDER BY mktsegment
    """,
    doc="LEFT-outer N-way star in ONE co-located task wave: the "
    "customer dim anchors, and two per-customer satellites (order "
    "stats; order-date span) chain through Acero LEFT-outer joins "
    "inside each bucket task — customers with no orders keep one "
    "row with both satellites null-filled, satellites missing from "
    "a bucket group read as schema-true empty tables, and adding a "
    "satellite still adds zero exchanges and zero join stages. The "
    "two satellites come from DIFFERENT builds (round-8's stats "
    "fixture and a fresh span table): co-location holds because the "
    "committed spec — key, bucket count, the engine's xxhash64 — is "
    "the one shared definition, which is exactly how a 100 TB "
    "lakehouse grows a star schema without re-laying anything out. "
    "Oracle: the plain two-LEFT-JOIN SQL star + rollup.",
    tags=("join", "table_log", "bucketed", "outer", "star"),
)
def colocated_left_star_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import colocated_multi_join

    r8 = _ensure_colocated_tables(spark, sf_dir)
    span = _ensure_order_span_table(spark, sf_dir)
    joined = colocated_multi_join(
        spark,
        [
            os.path.join(r8, "cust_dim"),
            os.path.join(r8, "order_stats"),
            os.path.join(span, "order_span"),
        ],
        how="left",
    )
    return (
        joined.groupBy("mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(F.col("n_orders").isNull(), 1).otherwise(0)
            ).alias("n_without_orders"),
            F.coalesce(F.sum("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.sum("span_days"), F.lit(0)).alias("span_days"),
        )
        .orderBy("mktsegment")
    )


_KEYSET = tuple(range(1, 3200, 64))  # 50 probe order keys


@register(
    "bucketed_keyset_lookup",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys_found
    FROM lineitem
    WHERE l_orderkey IN ({", ".join(str(k) for k in _KEYSET)})
    """,
    doc="KEYSET lookup — the scalable form of the point read: 50 "
    "probe keys hashed and type-coerced with ZERO jobs (driver-"
    "folded inline probe relation), grouped by the "
    "bucket group they live in, and served as one task per TOUCHED "
    "group (files + that group's keys), Arrow-side is_in filter — "
    "buckets no key hashes into are never read. point_lookup's "
    "one-plan-branch-per-key shape is right for a handful of keys "
    "(it serves the per-key probe_files contract); this is the shape "
    "for 'join these 100k ids against the warehouse', where the "
    "per-key plan would explode and a shuffle join would move the "
    "table. The oracle is the plain IN-list rollup over raw "
    "lineitem, so it also re-verifies the bucketed table's contents "
    "end-to-end.",
    tags=("table_log", "bucketed", "serving", "lookup"),
)
def bucketed_keyset_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.colocated import keyset_lookup

    root = _ensure_skewed_lines_tables(spark, sf_dir)
    hit = keyset_lookup(
        spark, os.path.join(root, "lines"), list(_KEYSET)
    )
    return hit.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("cents"),
        F.countDistinct("okey").alias("n_keys_found"),
    )


_BLOCK_MOD = 7


def _ensure_doc_blocklist_tables(spark: SparkSession, sf_dir: str) -> str:
    """Corpus + blocklist bucketed on doc_id with one committed spec:
    the decontamination SERVING layout (the batch Bloom path in
    plans/scale_ops.py decides WHAT to block; this layout makes
    applying a blocklist a zero-corpus-shuffle anti join)."""
    from ..operators.colocated import write_bucketed
    from ..sources import table_log as tl
    from ..sources.scratch import content_fingerprint, ensure_scratch

    key = content_fingerprint(
        os.path.join(sf_dir, "documents.parquet"), extra="blocklist"
    )
    root = os.path.join(tempfile.gettempdir(), f"csetl_docblk_{key}")

    def _intact(d: str) -> bool:
        for n in ("corpus", "blocklist"):
            t = os.path.join(d, n)
            if tl.current_version(t) != 0:
                return False
            if not all(os.path.exists(p) for p in tl.snapshot_files(t)):
                return False
        return True

    def _build(stage: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        write_bucketed(
            docs, os.path.join(stage, "corpus"),
            key_col="doc_id", n_buckets=16,
        )
        write_bucketed(
            docs.filter(
                F.pmod(F.col("doc_id"), F.lit(_BLOCK_MOD)) == 0
            ).select("doc_id"),
            os.path.join(stage, "blocklist"),
            key_col="doc_id", n_buckets=16,
        )

    ensure_scratch(root, _build, _intact)
    return root


_SPLIT_SLICES = 4
_SPLIT_TASK_ROWS = 1500


def _ensure_skewed_lines_tables(spark: SparkSession, sf_dir: str) -> str:
    """Fact-heavy SPJ fixture: every lineitem row bucketed by order
    key, laid out as ``_SPLIT_SLICES`` files per bucket (one overwrite
    + three appends, sliced by line number so the slicing is
    deterministic), plus an order dim with the same spec. The multi-
    file-per-bucket layout gives the skew splitter real row-group
    units to cut at."""
    from ..operators.colocated import write_bucketed, write_bucketed_native
    from ..sources import table_log as tl
    from ..sources.scratch import content_fingerprint, ensure_scratch

    lkey = content_fingerprint(os.path.join(sf_dir, "lineitem.parquet"))
    okey = content_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    root = os.path.join(
        tempfile.gettempdir(), f"csetl_skewspj_{lkey}_{okey}"
    )

    def _intact(d: str) -> bool:
        if tl.current_version(os.path.join(d, "lines")) != (
            _SPLIT_SLICES - 1
        ):
            return False
        if tl.current_version(os.path.join(d, "order_dim")) != 0:
            return False
        for n in ("lines", "order_dim"):
            t = os.path.join(d, n)
            if not all(os.path.exists(p) for p in tl.snapshot_files(t)):
                return False
        return True

    def _build(stage: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("okey"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.col("l_linenumber").alias("ln"),
        )
        for s in range(_SPLIT_SLICES):
            write_bucketed_native(
                li.filter(F.pmod(F.col("ln"), F.lit(_SPLIT_SLICES)) == s)
                .drop("ln"),
                os.path.join(stage, "lines"),
                key_col="okey",
                n_buckets=16,
                mode="overwrite" if s == 0 else "append",
            )
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("okey"),
                F.col("o_orderstatus").alias("status"),
            ),
            os.path.join(stage, "order_dim"),
            key_col="okey",
            n_buckets=16,
        )

    ensure_scratch(root, _build, _intact)
    return root


@register(
    "colocated_skew_split_join",
    oracle="""
    SELECT o.o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY status ORDER BY status
    """,
    doc="SKEW-RELIEVED storage-partitioned join: every lineitem row "
    "bucketed by order key (laid out as several files per bucket) "
    "joined against the order dim with max_task_rows forcing hot "
    "bucket groups to split into row-group-ranged chunks — each "
    "chunk joins against its group's FULL right side, so the union "
    "of chunk joins IS the join and the oracle (the plain SQL join + "
    "status rollup) hash-pins split-invariance. This is the SPJ "
    "analogue of AQE's skew-join split, planned from layout metadata "
    "(footer row counts; commit stats at warehouse scale) instead of "
    "runtime shuffle sizes: at 100 TB a power-law key (one customer, "
    "one domain) lands whole buckets on one task unless the planner "
    "can cut below bucket granularity, and the cut must never change "
    "results.",
    tags=("join", "table_log", "bucketed", "skew"),
)
def colocated_skew_split_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pyarrow.parquet as pq

    from ..operators.colocated import colocated_bucket_join
    from ..sources import table_log as tl

    root = _ensure_skewed_lines_tables(spark, sf_dir)
    lines = os.path.join(root, "lines")
    # bound = rows per chunk targeting ~64 tasks table-wide, floored
    # at _SPLIT_TASK_ROWS: a fixed absolute bound is miscalibrated
    # across scale factors (1500 splits sf0.01 into ~40 tasks but
    # sf10 into ~4000 Python-worker invocations); driver-side footer
    # sums are one read per file, the same metadata the splitter uses
    total = sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in tl.snapshot_files(lines)
    )
    joined = colocated_bucket_join(
        spark,
        lines,
        os.path.join(root, "order_dim"),
        max_task_rows=max(_SPLIT_TASK_ROWS, total // 64),
    )
    return (
        joined.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("status")
    )


# the synthetic lineitem's ship dates span 1995..2001 (NOT classic
# TPC-H's 1992..1998 — probed, not assumed)
_PRUNE_SLICES = ((0, 1996), (1997, 1998), (1999, 2000), (2001, 9999))
# epoch-day bounds of 1996 (1970..1995 spans 6 leap years; 1996 is one)
_PRUNE_LO, _PRUNE_HI = 9496, 9861


def _ensure_pruned_spj_tables(spark: SparkSession, sf_dir: str) -> str:
    """Lines bucketed by order key, appended in four ship-YEAR slices
    with per-file [min, max] epoch-day stats in each commit — the
    layout where zone-map pruning has sub-bucket file granularity to
    cut at — plus the order dim under the same spec."""
    from ..operators.colocated import write_bucketed
    from ..sources import table_log as tl
    from ..sources.scratch import content_fingerprint, ensure_scratch

    lkey = content_fingerprint(os.path.join(sf_dir, "lineitem.parquet"))
    okey = content_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    root = os.path.join(
        tempfile.gettempdir(), f"csetl_prunespj_{lkey}_{okey}"
    )

    def _intact(d: str) -> bool:
        if tl.current_version(os.path.join(d, "lines")) != (
            len(_PRUNE_SLICES) - 1
        ):
            return False
        if tl.current_version(os.path.join(d, "order_dim")) != 0:
            return False
        for n in ("lines", "order_dim"):
            t = os.path.join(d, n)
            if not all(os.path.exists(p) for p in tl.snapshot_files(t)):
                return False
        return True

    def _build(stage: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("okey"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-01"))
            ).alias("sd"),
            F.year("l_shipdate").alias("yr"),
        )
        for i, (a, b) in enumerate(_PRUNE_SLICES):
            write_bucketed(
                li.filter(F.col("yr").between(a, b)).drop("yr"),
                os.path.join(stage, "lines"),
                key_col="okey",
                n_buckets=16,
                stats_cols=["sd"],
                mode="overwrite" if i == 0 else "append",
            )
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("okey"),
                F.col("o_orderstatus").alias("status"),
            ),
            os.path.join(stage, "order_dim"),
            key_col="okey",
            n_buckets=16,
        )

    ensure_scratch(root, _build, _intact)
    return root


_PRUNED_RANGE_ORACLE = """
    SELECT o.o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY status ORDER BY status
    """


@register(
    "colocated_pruned_range_join",
    oracle=_PRUNED_RANGE_ORACLE,
    doc="ZONE-MAP pruning composed with the co-located layout: lines "
    "bucketed by order key and appended in ship-year slices, each "
    "slice's files carrying committed [min, max] epoch-day stats — a "
    "1996-only range join opens just the one overlapping slice's file "
    "per bucket (planned from the log, zero read-time footer I/O; "
    "files_kept/files_total pinned in tests), and the exact range "
    "filter applies Arrow-side before the per-bucket Acero join. "
    "Hash layout locates the KEY, commit stats locate the RANGE, one "
    "task plan uses both — the Iceberg partition-spec + manifest-"
    "stats composition on plain parquet. The oracle is the plain SQL "
    "range-filtered join + rollup, so pruning losslessness rides the "
    "hash check.",
    tags=("join", "table_log", "bucketed", "pruning"),
)
def colocated_pruned_range_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import colocated_bucket_join

    root = _ensure_pruned_spj_tables(spark, sf_dir)
    joined = colocated_bucket_join(
        spark,
        os.path.join(root, "lines"),
        os.path.join(root, "order_dim"),
        left_range=("sd", _PRUNE_LO, _PRUNE_HI),
    )
    return (
        joined.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("status")
    )


@register(
    "colocated_anti_join_decontaminate",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    WHERE doc_id % {_BLOCK_MOD} <> 0
    GROUP BY source ORDER BY source
    """,
    doc="ANTI-join decontamination at SERVING layout: the corpus and "
    "a blocklist both bucketed on doc_id, so removing blocked docs "
    "is a per-bucket Acero left-anti join — corpus bytes never cross "
    "an exchange, and buckets the (sparse) blocklist doesn't touch "
    "pass their rows through without building a hash table. This is "
    "the apply-side counterpart of bloom_decontaminate_docs: the "
    "Bloom path DECIDES what to block with a broadcast sketch; this "
    "layout APPLIES an arbitrary-size blocklist with zero corpus "
    "shuffle — at 100 TB a blocklist can outgrow any broadcast, but "
    "it can never outgrow its own buckets. Oracle: NOT-IN by the "
    "blocklist predicate, per-source survivor rollup.",
    tags=("join", "table_log", "bucketed", "dedup", "anti"),
)
def colocated_anti_join_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import colocated_bucket_join

    root = _ensure_doc_blocklist_tables(spark, sf_dir)
    kept = colocated_bucket_join(
        spark,
        os.path.join(root, "corpus"),
        os.path.join(root, "blocklist"),
        how="left_anti",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("source")
    )


@register(
    "colocated_pruned_range_join_right",
    oracle=_PRUNED_RANGE_ORACLE,
    doc="The SAME range-filtered join served with the roles swapped "
    "and the zone maps on the RIGHT: the order dim anchors the left "
    "side and the ship-year-sliced lines table probes as the right, "
    "right_range pruning the satellite's files inside each bucket "
    "group (filter-then-join semantics — the exact range filter "
    "applies to the right input Arrow-side). Same oracle as "
    "colocated_pruned_range_join: two plans, either side prunable, "
    "one hash-checked answer.",
    tags=("join", "table_log", "bucketed", "pruning"),
)
def colocated_pruned_range_join_right(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.colocated import colocated_bucket_join

    root = _ensure_pruned_spj_tables(spark, sf_dir)
    joined = colocated_bucket_join(
        spark,
        os.path.join(root, "order_dim"),
        os.path.join(root, "lines"),
        right_range=("sd", _PRUNE_LO, _PRUNE_HI),
    )
    return (
        joined.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("status")
    )


@register(
    "cdf_materialized_view_maintenance",
    oracle="""
    WITH final_rows AS (
      SELECT source, n_chars FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT source, n_chars FROM documents WHERE doc_id % 5 = 0
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM final_rows GROUP BY source ORDER BY source
    """,
    doc="INCREMENTALLY-MAINTAINED MATERIALIZED VIEW, composed from "
    "two existing faces of the format: the base table's streaming "
    "change feed (insert/remove deltas per commit; compaction "
    "skipped as layout-only) drives the partitioned CDC merge sink, "
    "which folds SIGNED per-source aggregates (insert +1/+chars, "
    "remove -1/-chars) into a bucketed table-log view — so the view "
    "is itself versioned, atomic per micro-batch, and rewrites only "
    "the buckets a delta touches. The base history is "
    "append/append/OVERWRITE/compact/append: the overwrite's removes "
    "must subtract the first two commits' contributions for the "
    "view to be right, and the oracle recomputes the FINAL snapshot "
    "aggregate directly from the source relation — the maintained "
    "view equals the recomputation exactly (additive integer merges "
    "are batch-split-invariant, so micro-batch boundaries cannot "
    "change the answer). At 100 TB this is how a downstream rollup "
    "follows a mutating lakehouse table at commit granularity, "
    "never rescanning it.",
    tags=("warehouse", "table-format", "streaming", "cdc", "ivm"),
)
def cdf_materialized_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources import table_log as tl
    from ..sources import table_log_source
    from ..sources.scratch import content_fingerprint, ensure_scratch
    from ..streaming.cdc import make_partitioned_cdc_sink
    from ..streaming.events import run_stream_foreach_batch

    table_log_source.register(spark)
    src = os.path.join(sf_dir, "documents.parquet")
    key = content_fingerprint(src, extra="ivm")
    root = os.path.join(tempfile.gettempdir(), f"csetl_tlog_ivm_{key}")
    base, view = os.path.join(root, "base"), os.path.join(root, "view")

    def _intact(d: str) -> bool:
        b, v = os.path.join(d, "base"), os.path.join(d, "view")
        if tl.current_version(b) != 4 or tl.current_version(v) is None:
            return False
        if not any(
            e["op"].startswith("cdc-batch-") for e in tl.log_entries(v)
        ):
            return False
        # the feed read removed files too; all ever-added must exist
        return all(
            os.path.exists(os.path.join(b, n))
            for e in tl.log_entries(b)
            for n in e["add"]
        ) and all(os.path.exists(p) for p in tl.snapshot_files(v))

    def _build(stage: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        b = os.path.join(stage, "base")
        tl.append(docs.filter(F.col("doc_id") % 3 == 0), b)
        tl.append(docs.filter(F.col("doc_id") % 3 == 1), b)
        tl.overwrite(docs.filter(F.col("doc_id") < 300), b)
        tl.compact(spark, b)
        tl.append(docs.filter(F.col("doc_id") % 5 == 0), b)

        def increments(batch_df: DataFrame) -> DataFrame:
            from ..streaming.cdc import change_sign

            sign = change_sign()
            return batch_df.groupBy("source").agg(
                F.sum(sign).alias("n_docs"),
                F.sum(sign * F.col("n_chars")).alias("chars"),
            )

        feed = (
            spark.readStream.format("table_log")
            .option("path", b)
            .option("changeFeed", "true")
            .load()
        )
        run_stream_foreach_batch(
            feed,
            make_partitioned_cdc_sink(
                os.path.join(stage, "view"),
                increments,
                key_col="source",
                add_cols=("n_docs", "chars"),
                n_buckets=8,
            ),
            checkpoint_dir=os.path.join(stage, "ckpt"),
        )

    ensure_scratch(root, _build, _intact)
    return (
        tl.read_snapshot(spark, view)
        .filter(F.col("n_docs") > 0)
        .select("source", "n_docs", "chars")
        .orderBy("source")
    )
