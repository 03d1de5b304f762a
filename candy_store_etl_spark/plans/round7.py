"""Round-7 additions.

The round-6 verdict's maturity directives as driver-checkable rows:

- ``table_log_checkpoint_native_read`` — the table-log's checkpoint
  path (O(interval) tail replay after thousands of commits) read
  through the ENGINE-NATIVE ``spark.read.format("table_log")``
  DataSource, with the replay cost IN the result so the oracle
  distinguishes checkpoint-replay from full-replay instead of
  trusting a docstring.
- ``pretraining_pipeline_funnel`` — the capstone: one end-to-end
  pretraining-data pipeline (scrub -> dedup -> decontaminate ->
  quality bucket -> chunk -> pack) emitting a per-stage row funnel,
  every stage oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register

# 13 appends cross one auto-checkpoint (CHECKPOINT_INTERVAL = 10):
# versions 0..12, checkpoint rides v10, latest replays v11+v12 = 2
# tail entries. The oracle hardcodes these as integers, so a reader
# that silently regressed to full replay (13 entries) hash-mismatches.
_TL_COMMITS = 13


@register(
    "table_log_checkpoint_native_read",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST({_TL_COMMITS - 1 - 10} AS BIGINT) AS entries_replayed,
           CAST(10 AS BIGINT) AS checkpoint_version
    FROM documents GROUP BY source
    """,
    doc="Table-log maturity, both halves the round-6 verdict named: "
    "(1) CHECKPOINTING — the scratch table takes 13 appends, so the "
    "auto-checkpoint at version 10 (the publicly documented Delta "
    "_last_checkpoint pattern) makes latest-snapshot resolution "
    "replay 2 tail commits instead of 13; the replayed-entry count "
    "and checkpoint version are columns in the RESULT, so the DuckDB "
    "oracle distinguishes checkpoint-replay from full-replay by hash "
    "(a regression to O(versions) replay flips entries_replayed to "
    "13 and fails the gate). (2) ENGINE-NATIVE READS — the data rows "
    "come through spark.read.format('table_log') "
    "(sources/table_log_source.py, a Spark-4 Python DataSource): one "
    "input partition per live data file, Arrow record batches into "
    "the JVM, committed [min,max] stats consulted for planning-time "
    "file pruning under pushFilters. At 100 TB the checkpoint is what "
    "keeps snapshot resolution metadata-bound after thousands of "
    "commits — the failure mode the format exists to avoid.",
    tags=("warehouse", "table-format", "checkpoint", "datasource"),
)
def table_log_checkpoint_native_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from ..sources import table_log as tl
    from ..sources import table_log_source
    from ..sources.scratch import content_fingerprint, ensure_scratch

    src = os.path.join(sf_dir, "documents.parquet")
    key = content_fingerprint(src, extra="ckpt")
    table = os.path.join(tempfile.gettempdir(), f"csetl_tlog_ckpt_{key}")

    def _intact(d: str) -> bool:
        if tl.current_version(d) != _TL_COMMITS - 1:
            return False
        info = tl.snapshot_replay_info(d)
        if info["checkpoint_version"] != 10:
            return False  # checkpoint must exist for the claim to hold
        return all(os.path.exists(p) for p in tl.snapshot_files(d))

    def _build(stage: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        for i in range(_TL_COMMITS):
            tl.append(
                docs.filter(F.col("doc_id") % _TL_COMMITS == i),
                stage,
                stats_cols=["doc_id"],
            )

    ensure_scratch(table, _build, _intact)
    info = tl.snapshot_replay_info(table)
    table_log_source.register(spark)
    snap = (
        spark.read.format("table_log").option("path", table).load()
    )
    return snap.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.lit(info["entries_replayed"]).cast("long").alias("entries_replayed"),
        F.lit(info["checkpoint_version"]).cast("long").alias(
            "checkpoint_version"
        ),
    )
