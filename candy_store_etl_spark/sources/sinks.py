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
