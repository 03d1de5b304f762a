"""Streaming corpus refresh driven by the table-log change feed.

The lakehouse "medallion" shape, composed entirely from pieces this
repo already ships: a LANDING table (``sources/table_log.py``)
receives raw document appends; the CURATED table follows it through
``spark.readStream.format("table_log").option("changeFeed", "true")``
(``sources/table_log_source.py``) — offsets ARE committed versions,
so each micro-batch carries exactly the landing commits since the
last trigger, never a rescan. The sink gates each batch's inserts
through the SAME stage primitives as the batch composites
(``operators/funnel.py``: quality score, exact content fingerprint,
bag-of-words near-dup fingerprint) and appends survivors to the
curated table in ONE atomic commit whose op tag
(``refresh-batch-{id}``) doubles as the idempotence ledger — the
identical swap-is-the-marker discipline as the CDC sink
(``streaming/cdc.py``).

Dedup semantics across the stream: within a batch, first-doc_id wins
per fingerprint; across batches, the curated table wins — the batch
anti-joins against the curated snapshot's fingerprint COLUMNS
(computed once at append and stored, so the standing dedup probe
reads two 16-byte-hash columns, never re-hashes the corpus text).
Scale shape: per trigger the work is O(batch) for flags plus one
hash-only anti-join against the curated fingerprint projection — the
standing dedup-index pattern; at 100 TB the fingerprint projection is
the column-pruned scan a real deployment would back with a bucketed
index table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.funnel import bow_fp, content_fp, quality_ok
from ..sources import table_log as tl

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def refreshed_batches(curated_dir: str) -> set[int]:
    """Batch ids whose refresh commits are in the curated log."""
    if tl.current_version(curated_dir) is None:
        return set()
    out = set()
    for e in tl.log_entries(curated_dir):
        m = re.fullmatch(r"refresh-batch-(\d+)", e["op"])
        if m:
            out.add(int(m.group(1)))
    return out


def curate_increment(
    inserts: DataFrame, curated_fps: DataFrame | None, *, qmin: float = 0.6
) -> DataFrame:
    """The refresh gate as one lazy plan: quality filter,
    first-doc_id-wins exact dedup within the increment, exact +
    bag-of-words anti-joins against the curated fingerprints (pass
    ``None`` for an empty curated table). Returns survivors carrying
    their ``fp``/``bowfp`` columns so the curated table stores them."""
    from ..functions.text import tokens

    t = tokens(F.col("text"))

    def running(flag_col, w):
        return F.sum(
            F.when(flag_col, F.lit(1)).otherwise(F.lit(0))
        ).over(w)

    def first_wins(col_name):
        return (
            Window.partitionBy(col_name)
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    # within-batch, first-doc_id wins per EXACT fingerprint and per
    # BAG-OF-WORDS fingerprint alike — two near-duplicates arriving in
    # the same micro-batch must not both enter the curated table (the
    # anti-joins below only see the PRE-batch snapshot)
    flagged = (
        inserts.select(*_DOC_COLS)
        .withColumn("q_ok", quality_ok(t, qmin))
        .withColumn("fp", content_fp(F.col("text")))
        .withColumn("bowfp", bow_fp(t))
        .withColumn(
            "fp_ok",
            F.col("q_ok") & (running(F.col("q_ok"), first_wins("fp")) == 1),
        )
        .withColumn(
            "keep",
            F.col("fp_ok")
            & (running(F.col("fp_ok"), first_wins("bowfp")) == 1),
        )
        .filter("keep")
        .drop("q_ok", "fp_ok", "keep")
    )
    if curated_fps is None:
        return flagged
    old_fp = curated_fps.select("fp").distinct()
    old_bow = curated_fps.select("bowfp").distinct()
    return (
        flagged.join(old_fp, "fp", "left_anti")
        .join(old_bow, "bowfp", "left_anti")
    )


def make_refresh_sink(
    curated_dir: str, *, qmin: float = 0.6, metrics: list | None = None
):
    """foreachBatch sink for the landing table's change feed: each
    micro-batch's INSERT rows are curated and appended atomically;
    retried epochs find their op already committed and return."""
    applied: set[int] | None = None

    def refresh_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal applied
        if applied is None:
            applied = refreshed_batches(curated_dir)
        if batch_id in applied:
            return
        spark = batch_df.sparkSession
        inserts = batch_df.filter(F.col("_change_type") == "insert")
        curated_fps = (
            tl.read_snapshot(spark, curated_dir).select("fp", "bowfp")
            if tl.current_version(curated_dir) is not None
            else None
        )
        survivors = curate_increment(inserts, curated_fps, qmin=qmin)
        # an all-filtered batch still commits its marker: at-least-once
        # delivery must not re-curate it after a restart
        v = tl.append(
            survivors, curated_dir, op=f"refresh-batch-{batch_id}"
        )
        applied.add(batch_id)
        if metrics is not None:
            import os

            import pyarrow.parquet as pq

            entry = tl.log_entries(curated_dir, upto=v)[-1]
            metrics.append(
                {
                    "batch_id": batch_id,
                    "appended_rows": sum(
                        pq.read_metadata(
                            os.path.join(curated_dir, n)
                        ).num_rows
                        for n in entry["add"]
                    ),
                }
            )

    return refresh_batch


def run_landing_to_curated(
    spark,
    landing_dir: str,
    curated_dir: str,
    checkpoint_dir: str,
    *,
    qmin: float = 0.6,
    metrics: list | None = None,
    consumer: str = "curated-refresh",
) -> None:
    """Drive the curated table up to the landing table's current
    version: one availableNow pass over the change feed, foreachBatch
    curation, atomic refresh commits. Re-running after more landing
    commits processes ONLY the new versions (stream offsets are
    committed versions, resumed from the checkpoint). After the pass,
    the pipeline registers its offset with the LANDING table
    (``set_cdf_consumer_offset``) so ``vacuum(cdf_horizon="auto")``
    on the landing side never reclaims files this consumer still
    needs — the version captured BEFORE the run is the safe lower
    bound for what the pass is guaranteed to have covered."""
    from ..sources import table_log_source

    table_log_source.register(spark)
    horizon = tl.current_version(landing_dir)
    feed = (
        spark.readStream.format("table_log")
        .option("path", landing_dir)
        .option("changeFeed", "true")
        .load()
    )
    from .events import _scoped_shuffle_partitions, replay_state_partitions

    with _scoped_shuffle_partitions(spark, replay_state_partitions(spark)):
        q = (
            feed.writeStream.foreachBatch(
                make_refresh_sink(curated_dir, qmin=qmin, metrics=metrics)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if horizon is not None:
        tl.set_cdf_consumer_offset(landing_dir, consumer, horizon)
