"""Structured Streaming surface (SURVEY.md §2.8 — absent in the
reference, first-class here).

The reference's daily batch loop (`data_processor.py:172`) is a
hand-rolled incremental pipeline; its idiomatic Spark form is a
streaming source + watermarked windows + keyed state:

- ``stream_events``: file-source stream over the events table (in
  production: Kafka with the same downstream plan).
- ``windowed_event_stats``: tumbling-window aggregate with an explicit
  watermark. Late-data policy (the reference has none, so we define
  one): events later than the watermark are DROPPED; everything within
  it is aggregated exactly-once per window+type.
- ``streaming_inventory_allocation``: the allocation operator's
  streaming twin — per-product running stock via
  ``applyInPandasWithState``, batch-order-deterministic within each
  micro-batch. State is one long per product, so a 1000-executor
  cluster holds the whole catalog trivially.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# explicit schema — a streaming source must never infer. events.ts has
# shipped both as parquet TIMESTAMP(NANOS) (read as long, converted)
# and TIMESTAMP(MICROS); a one-time batch probe of the directory picks
# the matching declared schema (sources/tpch.py does the same for
# batch reads).
def _events_raw_schema(spark: SparkSession, path_dir: str) -> StructType:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(path_dir).schema["ts"].dataType
    ts_type = LongType() if isinstance(probed, LongType) else probed
    return StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("ts", ts_type, False),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )


def stream_events(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    schema = _events_raw_schema(spark, path_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):  # nanos as long
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast(TimestampType()))


def windowed_event_stats(
    stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate (append-mode compatible)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_event_stats(
    stream: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregate — each event lands in window/slide
    overlapping buckets (here 2); Spark expands rows into their
    windows before the keyed aggregation."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n")
    )


def dedup_event_stream(
    stream: DataFrame,
    *,
    keys: Iterable[str] = ("user_id", "event_type"),
    watermark: str = "2 hours",
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming deduplication — the state-store twin of batch
    ``SELECT DISTINCT`` (and of operators/dedup.exact_dedup).

    The first arrival per key survives; later duplicates are suppressed
    by the keyed state store. Only the key columns are emitted, because
    the surviving row's other attributes depend on arrival order —
    projecting them away makes the result deterministic and exactly
    equal to batch DISTINCT over the same input.

    ``within_watermark=False`` (default): global dedup; state never
    expires (keys exclude the event-time column), which is the exact
    semantics the correctness gate checks on a bounded replay.
    ``within_watermark=True``: ``dropDuplicatesWithinWatermark`` — the
    100 TB production variant; state lives only for the watermark
    delay, so it bounds memory and suppresses duplicates that arrive
    within the delay (a key recurring later is emitted again).
    """
    keys = list(keys)
    wm = stream.withWatermark("ts", watermark)
    deduped = (
        wm.dropDuplicatesWithinWatermark(keys)
        if within_watermark
        else wm.dropDuplicates(keys)
    )
    return deduped.select(*keys)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    left_type: str = "purchase",
    right_type: str = "error",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER interval join — the streaming twin of the
    batch range join (plans/extended.errors_after_purchase).

    Each left event (default: purchase) pairs with every right event
    (default: error) by the SAME user within ``[l.ts, l.ts+within]``.
    Both sides carry watermarks and the join predicate bounds right.ts
    relative to left.ts, so Spark derives state-expiry for BOTH join
    buffers — without the time bound a stream-stream join would hold
    all history forever, which is the 100 TB failure mode this
    operator exists to avoid. Inner-join matches are emitted as they
    form (append mode), so the result set for a bounded replay is
    exactly the batch interval join over the same input — that
    equality is the correctness gate's oracle.
    """
    ltbl = (
        left.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
            F.col("value").alias("left_value"),
        )
        .withWatermark("l_ts", watermark)
    )
    rtbl = (
        right.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return ltbl.join(rtbl, cond, "inner").select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        F.col("left_value"),
        # exact integer micros — float seconds would be engine-noise-free
        # too, but integers need no rounding policy at all
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_micros"),
    )


def session_event_stats(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (dynamic width, closed after ``gap`` of
    inactivity) — the streaming twin of the batch sessionization query
    (plans/advanced.py user_sessions)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def replay_state_partitions(spark) -> int:
    """State-store partition count for a bounded replay: ``max(session
    shuffle partitions, defaultParallelism)``, env-overridable via
    ``SPARK_GRAFT_REPLAY_STATE_PARTITIONS``.

    Scale posture, not a local tune (r13): a stateful stream fixes its
    state-store instance count from ``spark.sql.shuffle.partitions``
    at first checkpoint, so a session-default 200 CAPS state
    parallelism at 200 stores on any cluster — on 100 TB state every
    store becomes huge and the per-batch commit serializes over too
    few tasks. Taking the max lifts the cap to the cluster's core
    count while being the IDENTITY locally (32-core session: max(32,
    32); vanilla 200-partition session on 8 cores: max(200, 8) = 200)
    — deliberately so, because the r12 interleaved A/B measured that
    SHRINKING the local count to the core count is slower (many tiny
    HDFS-backed stores amortize per-batch planning; negative result
    recorded in OPTIMIZATION_r12.md and not re-spent here)."""
    import os as _os

    override = _os.environ.get("SPARK_GRAFT_REPLAY_STATE_PARTITIONS")
    if override:
        return max(1, int(override))
    current = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(current, spark.sparkContext.defaultParallelism)


class _scoped_shuffle_partitions:
    """Set ``spark.sql.shuffle.partitions`` for the duration of one
    bounded replay, restoring the session value afterwards (replays in
    this engine are serial; the runtime conf is session-wide)."""

    def __init__(self, spark, n: int) -> None:
        self._spark, self._n = spark, n

    def __enter__(self):
        self._old = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set("spark.sql.shuffle.partitions", str(self._n))

    def __exit__(self, *exc):
        self._spark.conf.set("spark.sql.shuffle.partitions", self._old)
        return False


def run_stream_foreach_batch(
    stream_df: DataFrame,
    batch_fn,
    *,
    checkpoint_dir: str | None = None,
) -> None:
    """Drive a bounded stream through ``foreachBatch`` to completion.

    ``foreachBatch(fn(batch_df, epoch_id))`` is the composition point
    between streaming and every batch sink the engine has: the
    function receives each micro-batch as a plain DataFrame and can
    write partitioned parquet, upsert into a bucketed table, or call
    any pipeline stage. Spark retries a failed epoch with the SAME
    epoch_id — idempotent writes keyed on it give effective
    exactly-once into non-transactional sinks.
    """
    spark = stream_df.sparkSession
    writer = stream_df.writeStream.foreachBatch(batch_fn)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    with _scoped_shuffle_partitions(spark, replay_state_partitions(spark)):
        q = writer.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def run_stream_to_memory(
    stream_df: DataFrame, name: str, *, output_mode: str = "append"
) -> None:
    """Drive a bounded stream to completion into a memory table."""
    spark = stream_df.sparkSession
    with _scoped_shuffle_partitions(spark, replay_state_partitions(spark)):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API): per-user
# running totals. The successor to applyInPandasWithState — typed state
# handles (Value/List/Map), timers, and TTL; requires the RocksDB state
# store provider (STREAMING_STATE_CONF below) AND the `protobuf`
# python package (the state server protocol) — absent in minimal
# environments, where tests importorskip it and
# streaming_inventory_allocation (applyInPandasWithState, no protobuf
# dependency) remains the exercised stateful path.
# ---------------------------------------------------------------------------
RUNNING_TOTAL_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("batch_events", LongType(), False),
        StructField("total_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

STREAMING_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
}


def _running_total_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType(), False),
                        StructField("cents", LongType(), False),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timer_values):
            prev = self._state.get()
            n, cents = (prev[0], prev[1]) if prev is not None else (0, 0)
            batch_n = 0
            for pdf in rows:
                batch_n += len(pdf)
                # integer-cents accumulation — exact across batches
                cents += int(
                    (pdf["value"].astype(float) * 100 + 0.5)
                    .pipe(np.floor)
                    .astype("int64")
                    .sum()
                )
            n += batch_n
            self._state.update((n, cents))
            (user_id,) = key
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)],
                    "batch_events": [batch_n],
                    "total_events": [n],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotal()


def streaming_running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user cumulative event count/value across micro-batches via
    the typed-state API (one ValueState row per user — 10^9 users is
    ordinary RocksDB state-store load spread over the cluster)."""
    return stream.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_running_total_processor(),
        outputStructType=RUNNING_TOTAL_OUTPUT,
        outputMode="append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Event-time timeouts: abandoned-session detection. State that EMITS
# ON SILENCE — the watermark passing (last activity + gap) fires the
# timeout callback, the pattern polling-based batch jobs can't express
# incrementally.
# ---------------------------------------------------------------------------
ABANDONED_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("last_ts", TimestampType(), True),
        StructField("n_events", LongType(), False),
        StructField("abandoned", IntegerType(), False),
    ]
)
ABANDONED_STATE = StructType(
    [
        StructField("last_us", LongType(), False),
        StructField("n", LongType(), False),
    ]
)


def make_abandoned_fn(gap_seconds: int, closing_type: str = "purchase"):
    def track(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # silence: the watermark passed last activity + gap with no
            # closing event → emit the abandoned session, drop state
            last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [int(n)],
                    "abandoned": [1],
                }
            )
            return
        last_us, n = state.get if state.exists else (0, 0)
        closed = False
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["ts"].max()
            last_us = max(last_us, int(pd.Timestamp(batch_max).value // 1000))
            if (pdf["event_type"] == closing_type).any():
                closed = True
        if closed:
            # converted: emit immediately, clear state
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [int(n)],
                    "abandoned": [0],
                }
            )
        else:
            state.update((int(last_us), int(n)))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

    return track


def abandoned_sessions(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    gap_seconds: int = 1800,
    closing_type: str = "purchase",
) -> DataFrame:
    """Per-user abandonment: a session with no ``closing_type`` event
    within ``gap`` of its last activity emits with ``abandoned=1`` when
    the watermark passes the deadline; a closing event emits
    ``abandoned=0`` immediately."""
    return (
        stream.withWatermark("ts", gap)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_abandoned_fn(gap_seconds, closing_type),
            outputStructType=ABANDONED_OUTPUT,
            stateStructType=ABANDONED_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


# ---------------------------------------------------------------------------
# Stateful streaming: running inventory allocation.
# ---------------------------------------------------------------------------
ALLOC_OUTPUT_SCHEMA = StructType(
    [
        StructField("product_id", LongType(), False),
        StructField("seq", LongType(), False),
        StructField("qty", IntegerType(), False),
        StructField("allocated_qty", IntegerType(), False),
        StructField("cancelled", IntegerType(), False),
        StructField("event_time", TimestampType(), True),
    ]
)
ALLOC_STATE_SCHEMA = StructType([StructField("remaining", LongType(), False)])


def make_allocation_fn(initial_stock: dict[int, int]):
    """Build the per-group stateful function. ``initial_stock`` is a
    small catalog map shipped in the task closure (broadcast-sized).

    The group's rows arrive as an ITERATOR of Arrow-chunked frames in
    no guaranteed order (chunk boundary = arrow.maxRecordsPerBatch,
    default 10k rows): sorting each chunk independently would allocate
    later seqs before earlier ones whenever one micro-batch exceeds a
    chunk (round-6 review finding) — so the chunks are concatenated
    and sorted ONCE per micro-batch before the scan. The whole group's
    batch already had to fit one task; the concat changes peak memory
    by at most one chunk."""

    def allocate(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (product_id,) = key
        if state.exists:
            (remaining,) = state.get
        else:
            remaining = int(initial_stock.get(product_id, 0))
        chunks = list(pdfs)
        if not chunks:  # timeout-only invocation: nothing to allocate
            state.update((int(remaining),))
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values("seq", kind="mergesort")
        allocated = []
        cancelled = []
        for q in pdf["qty"].astype(int):
            if 0 <= q <= remaining:
                allocated.append(q)
                cancelled.append(0)
                remaining -= q
            else:
                allocated.append(0)
                cancelled.append(1 if q > 0 else 0)
        res = pdf[["product_id", "seq", "qty", "event_time"]].copy()
        res["allocated_qty"] = allocated
        res["cancelled"] = cancelled
        state.update((int(remaining),))
        yield res[
            [
                "product_id",
                "seq",
                "qty",
                "allocated_qty",
                "cancelled",
                "event_time",
            ]
        ]

    return allocate


def streaming_inventory_allocation(
    stream: DataFrame,
    initial_stock: dict[int, int],
) -> DataFrame:
    """Running greedy allocation over a stream of
    (product_id, seq, qty, event_time) — state carries across
    micro-batches exactly like the reference's inventory carries
    across days (`data_processor.py:240-259`)."""
    return stream.groupBy("product_id").applyInPandasWithState(
        make_allocation_fn(initial_stock),
        outputStructType=ALLOC_OUTPUT_SCHEMA,
        stateStructType=ALLOC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


ALLOC_BUCKET_STATE_SCHEMA = StructType(
    [
        StructField("products", ArrayType(LongType()), False),
        StructField("remaining", ArrayType(LongType()), False),
    ]
)


def make_bucket_allocation_fn(initial_stock: dict[int, int]):
    """Per-BUCKET stateful function: the state row holds the
    (products, remaining) stock vectors for every product hashed into
    the bucket, and each micro-batch frame is allocated with the SAME
    vectorized ``_greedy_kernel`` the batch flagship runs (sorted
    (product, seq), per-group certain-prefix pass)."""
    import numpy as np

    from ..operators.allocation import _greedy_kernel, _qty_to_int64

    def allocate(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            prods0, rems0 = state.get
            stock_map = dict(zip(prods0, rems0))
        else:
            stock_map = {}
        # Arrow chunks a group's micro-batch at maxRecordsPerBatch in
        # no guaranteed order: concatenate BEFORE sorting, or a
        # product spanning two chunks would allocate later seqs first
        # (round-6 review finding; same fix as make_allocation_fn)
        chunks = list(pdfs)
        merged = (
            [pd.concat(chunks, ignore_index=True)] if len(chunks) > 1
            else chunks
        )
        for pdf in merged:
            pdf = pdf.sort_values(["product_id", "seq"], kind="mergesort")
            prod = pdf["product_id"].to_numpy().astype(np.int64)
            qty = _qty_to_int64(pdf["qty"].to_numpy(), "qty")
            n = len(qty)
            starts = np.empty(n, dtype=bool)
            if n:
                starts[0] = True
                starts[1:] = prod[1:] != prod[:-1]
            start_idx = np.flatnonzero(starts)
            group_products = prod[start_idx]
            group_stock = np.fromiter(
                (
                    stock_map.get(p, initial_stock.get(p, 0))
                    for p in group_products.tolist()
                ),
                np.int64,
                count=len(group_products),
            )
            # the kernel reads stock at group-start rows only
            stock_rows = np.zeros(n, np.int64)
            stock_rows[start_idx] = group_stock
            allocated, cancelled = _greedy_kernel(prod, qty, stock_rows)
            # per-group allocation totals -> updated remaining stock
            used = (
                np.add.reduceat(allocated, start_idx)
                if n
                else np.empty(0, np.int64)
            )
            for p, s, u in zip(
                group_products.tolist(), group_stock.tolist(), used.tolist()
            ):
                stock_map[p] = int(s - u)
            res = pdf[["product_id", "seq", "qty", "event_time"]].copy()
            res["allocated_qty"] = allocated.astype(np.int32)
            res["cancelled"] = cancelled.astype(np.int32)
            yield res[
                [
                    "product_id",
                    "seq",
                    "qty",
                    "allocated_qty",
                    "cancelled",
                    "event_time",
                ]
            ]
        state.update(
            (list(stock_map.keys()), [int(v) for v in stock_map.values()])
        )

    return allocate


def streaming_inventory_allocation_bucketed(
    stream: DataFrame,
    initial_stock: dict[int, int],
    *,
    buckets: int = 64,
) -> DataFrame:
    """``streaming_inventory_allocation`` with BUCKET-keyed state — the
    streaming twin of the batch operator's ``buckets`` option, and the
    fix for the same bottleneck: with millions of low-traffic products,
    per-product state groups pay the Arrow/pandas per-group overhead
    once per product per micro-batch (measured 17 k rows/s sustained at
    sf1's 200 k products — the overhead, not the scan, is the bill).
    Hashing products into ``buckets`` state keys turns that into
    ``buckets`` group invocations per batch over (product, seq)-sorted
    frames running the batch flagship's vectorized kernel, with the
    state row carrying the bucket's (products, remaining) stock
    vectors. Results are identical (allocation is per-product
    independent; parity with the per-product form is pinned in
    tests/test_streaming.py). Size ``buckets`` so one bucket's product
    vector stays comfortably in a state row — at 1e9 products and 64 k
    buckets that is ~15 k products/row; state rows total = bucket
    count, not product count."""
    bucket = F.pmod(F.hash(F.col("product_id")), F.lit(buckets))
    return (
        stream.withColumn("__bucket", bucket)
        .groupBy("__bucket")
        .applyInPandasWithState(
            make_bucket_allocation_fn(initial_stock),
            outputStructType=ALLOC_OUTPUT_SCHEMA,
            stateStructType=ALLOC_BUCKET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    **options: str,
) -> dict[str, str]:
    """Assemble the option map for a Kafka stream read — split out so
    the plumbing is unit-testable without the Kafka connector jar
    (absent in this container; `stream_events` file replay feeds the
    identical downstream plans)."""
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers must be non-empty")
    required = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    clash = required.keys() & options.keys()
    if clash:
        raise ValueError(f"options {sorted(clash)} conflict with named args")
    return {**required, **options}


def stream_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    **options: str,
) -> DataFrame:
    """Events stream from Kafka: JSON payloads in ``value``, parsed
    into the SAME output columns/types as the file replay, so every
    downstream plan (windows, dedup, sessionization, stateful
    allocation) is source-agnostic.

    Wire format: ``ts`` may arrive either as an ISO-8601 string (the
    natural JSON encoding) or as the epoch-nanos integer the parquet
    replay carries — both parse to the same TimestampType column
    (``to_timestamp`` for strings, nanos→micros for all-digit
    payloads), so a producer replaying the historical records is not a
    special case.

    Requires the ``spark-sql-kafka`` connector jar on the classpath;
    without it, Spark's source resolution fails at ``load()`` (the
    option plumbing itself is pinned by tests either way).
    """
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_reader_options(bootstrap_servers, topic, **options))
        .load()
    )
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            StructType(
                [
                    StructField("event_id", LongType(), False),
                    StructField("ts", StringType(), True),
                    StructField("user_id", LongType(), True),
                    StructField("event_type", StringType(), True),
                    StructField("value", DoubleType(), True),
                    StructField("props", StringType(), True),
                ]
            ),
        ).alias("e"),
        F.col("timestamp").alias("kafka_ts"),
    )
    return parsed.select(
        "e.event_id",
        parse_event_ts(F.col("e.ts")).alias("ts"),
        "e.user_id",
        "e.event_type",
        "e.value",
        "e.props",
    )


def parse_event_ts(ts_str) -> "F.Column":
    """Wire-format-tolerant event-time parse: all-digit payloads are
    epoch NANOS (the parquet replay's representation), anything else
    goes through ``to_timestamp`` (ISO-8601 and friends). nanos→micros
    drops the last three DIGITS (string slice, exact) — epoch nanos
    exceed 2^53, so a double-division route would wobble by ±1 µs.
    Unit-tested on batch frames — the Kafka jar is absent here."""
    micros = F.when(
        F.length(ts_str) > 3,
        ts_str.substr(F.lit(1), F.length(ts_str) - 3).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return F.when(
        ts_str.rlike("^[0-9]+$"), F.timestamp_micros(micros)
    ).otherwise(F.to_timestamp(ts_str))
