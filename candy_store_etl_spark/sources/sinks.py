"""Sinks.

``save_single_csv`` mirrors the reference's report sink
(`data_processor.py:62-85`): one named CSV file with a header. Correct
for *report-sized* outputs only — ``coalesce(1)`` serializes the final
stage through one task. Fact-sized data goes through
``write_partitioned`` (parquet, partition column pruning at read
time), which is the 100 TB path.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def materialize_overlapped(
    outputs: dict[str, DataFrame] | list[DataFrame],
    max_workers: int = 3,
    sink=None,
) -> None:
    """Materialize independent outputs with overlapping Spark jobs
    (optimization guide §2.6): actions are only sequential because the
    driver calls them sequentially, so a small thread pool lets the
    next job's tasks back-fill executors freed by the current job's
    straggler tail. 2-3 jobs in flight is the guide's recommendation —
    enough to fill the tail, not so many that they fight for cores.

    Each write gets a thread-local job description so the UI stays
    readable. ``sink`` defaults to the noop materializer; pass a
    callable for real writes. Interleaved ABBA at sf0.1 (r12): the
    candy pipeline's five outputs 3.00 s sequential vs 2.53 s
    overlapped, median of 4."""
    from concurrent.futures import ThreadPoolExecutor

    if isinstance(outputs, dict):
        items = list(outputs.items())
    else:
        items = [(f"output_{i}", df) for i, df in enumerate(outputs)]
    if sink is None:
        def sink(df):  # noqa: E306 — default: compute-and-discard
            df.write.format("noop").mode("overwrite").save()

    def one(item):
        name, df = item
        sc = df.sparkSession.sparkContext
        sc.setJobDescription(f"materialize: {name}")
        try:
            sink(df)
        finally:
            sc.setJobDescription(None)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        # list() re-raises the first failure instead of swallowing it
        list(pool.map(one, items))


def save_single_csv(df: DataFrame, output_path: str, filename: str) -> str:
    """Write ``df`` as exactly one ``<output_path>/<filename>`` CSV."""
    os.makedirs(output_path, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=output_path, prefix=".csv_stage_")
    try:
        (
            df.coalesce(1)
            .write.option("header", "true")
            .mode("overwrite")
            .csv(tmp)
        )
        parts = glob.glob(os.path.join(tmp, "part-*.csv"))
        if len(parts) != 1:
            raise RuntimeError(f"expected one part file, found {parts}")
        final = os.path.join(output_path, filename)
        shutil.move(parts[0], final)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_partitioned(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None
) -> None:
    """Scale sink: partitioned parquet (the inter-stage exchange format;
    temp views don't survive session boundaries — SURVEY §3.3)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """Training-data export sink: sharded JSON-lines (one object per
    line), optionally gzipped — the interchange format LLM data
    pipelines hand to tokenizer/loader stages. Pair ``partition_by``
    with a shard-assignment column (see ``doc_shard_assignment``) for
    stable shard directories; each task writes its own file, so the
    export scales with the cluster, never through one writer."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_orc(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None
) -> None:
    """Columnar sink twin of ``write_partitioned`` in ORC — same
    pruning/pushdown story as parquet for stacks standardized on ORC
    (native Spark support, no extra jars)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_files(
    spark,
    in_path: str,
    out_path: str,
    *,
    target_mb: float = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Small-files compaction — the maintenance op every long-lived
    table needs (streaming sinks and fine-grained partitioned writes
    accumulate kilobyte files; at 100 TB the resulting task-per-file
    scheduling and footer-read overhead dominates scans).

    Sizes the output from the INPUT's real bytes (``ceil(bytes /
    target_mb)``), then either ``repartitionByRange(sort_by)`` — which
    both compacts and gives each output file a disjoint key range, so
    min/max zone maps prune like the Z-order layout pass — or a plain
    round-robin ``repartition`` when no layout key is given. Returns
    the number of files written. The rewrite is one shuffle of the
    data; at scale this runs per-partition (compact only partitions
    whose file count exceeds a threshold), which composes as a filter
    on the partition column before this call.
    """
    import math

    df = spark.read.parquet(in_path)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(in_path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if sort_by:
        shaped = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        shaped = df.repartition(n_files)
    shaped.write.mode("overwrite").parquet(out_path)
    return len(glob.glob(os.path.join(out_path, "part-*.parquet")))
