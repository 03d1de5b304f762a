"""Partition-scoped CDC merge-upsert through the table log.

The round-6 streaming harness's CDC sink was honest about its one
at-scale flaw: every micro-batch rewrote the WHOLE warehouse table
(``SCALING.md``'s own caveat; round-6 verdict "What's wrong" #3).
This module is the fix, composed from two pieces that already exist:

- the warehouse table is HASH-BUCKETED on the merge key — every data
  file holds exactly one bucket, and the bucket id is IN the file
  name (``b00042-c3-0.parquet``), Hive-partitioning style, so file
  selection for a merge is a name test, no footer or stats I/O;
- each micro-batch commits through ``sources/table_log.py``: the
  commit removes the touched buckets' old files and adds their
  rewrites in ONE atomic version, so readers see the pre-batch or
  post-batch snapshot, never a mix — and files of UNTOUCHED buckets
  are not merely byte-identical, they are the same inodes, never
  opened;
- the LOG is the idempotence ledger: each batch commits with op
  ``cdc-batch-{id}``, and a retried batch (foreachBatch is
  at-least-once) finds its op already committed and returns. This
  closes a hole the round-6 file-marker ledger had — a crash between
  the state swap and the marker write double-applied the batch; here
  the swap IS the marker.

Scale shape: rewrite volume per batch is proportional to the number
of TOUCHED buckets (≈ touched keys for small batches), not to the
warehouse size — the property that lets a 100 TB warehouse absorb a
trickle of CDC updates without rewriting 100 TB per trigger. The
merge itself is the same full-outer reconciliation a Delta MERGE
lowers to, now joined against only the touched buckets' rows.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import table_log as tl

_BUCKET_RE = re.compile(r"b(\d{5})-")


def bucket_expr(key_col: str, n_buckets: int):
    """The one definition of key -> bucket, shared by writes and
    merges: pmod(xxhash64(key), n) — uniform, type-stable, computable
    on both sides without storing the bucket in the data."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _bucket_of_name(name: str) -> int:
    m = _BUCKET_RE.match(os.path.basename(name))
    if m is None:
        raise ValueError(f"not a CDC bucket file: {name!r}")
    return int(m.group(1))


def applied_batches(table_dir: str) -> set[int]:
    """Batch ids whose commits are in the log — the idempotence
    ledger, for free."""
    if tl.current_version(table_dir) is None:
        return set()
    out = set()
    for e in tl.log_entries(table_dir):
        m = re.fullmatch(r"cdc-batch-(\d+)", e["op"])
        if m:
            out.add(int(m.group(1)))
    return out


def make_partitioned_cdc_sink(
    table_dir: str,
    increments_fn,
    *,
    key_col: str,
    add_cols: tuple[str, ...],
    n_buckets: int = 256,
    metrics: list | None = None,
):
    """foreachBatch sink MERGE-upserting additive per-key aggregates
    into a bucketed table-log warehouse, rewriting ONLY the buckets a
    batch touches.

    ``increments_fn(batch_df) -> DataFrame`` must return one row per
    ``key_col`` with the additive ``add_cols``; the merge is
    old + increment per column (missing side = 0). ``metrics``, if
    given, collects one dict per applied batch with the rewrite-volume
    evidence (buckets/files/rows touched vs total).
    """
    # the applied-id ledger is read from the log ONCE (covers a sink
    # restarting over an existing table), then maintained in the sink
    # closure — batch N must not replay N commit files just to learn
    # it hasn't run yet (that's quadratic metadata I/O over the
    # stream's lifetime, the cost curve the checkpoint exists to kill)
    applied: set[int] | None = None

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..caching import scoped_cache

        nonlocal applied
        if applied is None:
            applied = applied_batches(table_dir)
        if batch_id in applied:
            return  # retried epoch: the committed swap IS the marker
        spark = batch_df.sparkSession
        # the increments relation is per-key-sized and consumed by two
        # actions (touched-bucket collect, merge write); caching it
        # keeps the SOURCE batch read to exactly one pass
        with scoped_cache(
            increments_fn(batch_df).withColumn(
                "bucket", bucket_expr(key_col, n_buckets)
            )
        ) as inc:
            # touched-bucket list is metadata-sized (<= n_buckets ints)
            touched = sorted(
                r.bucket for r in inc.select("bucket").distinct().collect()
            )
            if not touched:
                tl.commit(table_dir, op=f"cdc-batch-{batch_id}")
                applied.add(batch_id)
                return
            touched_set = set(touched)
            live = (
                tl.snapshot_files(table_dir)
                if tl.current_version(table_dir) is not None
                else []
            )
            old_touched = [
                p for p in live if _bucket_of_name(p) in touched_set
            ]
            if old_touched:
                cur = spark.read.parquet(*old_touched)
                old_k = cur.select(
                    F.col(key_col).alias("_k"),
                    *[F.col(c).alias(f"_old_{c}") for c in add_cols],
                )
                # eqNullSafe: a NULL merge key is ONE key (matching the
                # batch aggregate's null group), not a row that dodges
                # the join and duplicates every batch
                merged = old_k.join(
                    inc, old_k["_k"].eqNullSafe(inc[key_col]), "full_outer"
                ).select(
                    F.coalesce("_k", key_col).alias(key_col),
                    *[
                        (
                            F.coalesce(f"_old_{c}", F.lit(0))
                            + F.coalesce(c, F.lit(0))
                        ).alias(c)
                        for c in add_cols
                    ],
                )
            else:
                merged = inc.select(key_col, *add_cols)
            merged = merged.withColumn(
                "bucket", bucket_expr(key_col, n_buckets)
            ).repartition(F.col("bucket"))
            # hash-repartition on bucket puts each bucket entirely in
            # one task, so partitionBy emits exactly ONE file per
            # bucket (not one per task per bucket); the bucket is then
            # folded into the FILE NAME and not stored in the data (it
            # is a pure function of the key)
            stage = os.path.join(
                table_dir, f"_cdc_stage.{batch_id}.{os.getpid()}"
            )
            merged.write.partitionBy("bucket").mode("overwrite").parquet(
                stage
            )
        os.makedirs(table_dir, exist_ok=True)
        names = []
        for bdir in sorted(glob.glob(os.path.join(stage, "bucket=*"))):
            b = int(os.path.basename(bdir).split("=")[1])
            for i, p in enumerate(
                sorted(glob.glob(os.path.join(bdir, "part-*.parquet")))
            ):
                name = f"b{b:05d}-c{batch_id}-{i}.parquet"
                os.replace(p, os.path.join(table_dir, name))
                names.append(name)
        shutil.rmtree(stage, ignore_errors=True)
        tl.commit(
            table_dir,
            add=names,
            remove=[os.path.basename(p) for p in old_touched],
            op=f"cdc-batch-{batch_id}",
        )
        applied.add(batch_id)
        if metrics is not None:
            # footer row counts: metadata I/O only, zero Spark jobs —
            # per-batch metrics must not distort the measured trigger
            import pyarrow.parquet as pq

            post = tl.snapshot_files(table_dir)
            metrics.append(
                {
                    "batch_id": batch_id,
                    "touched_buckets": len(touched),
                    "files_rewritten": len(names),
                    "files_total": len(post),
                    "rows_rewritten": sum(
                        pq.read_metadata(
                            os.path.join(table_dir, n)
                        ).num_rows
                        for n in names
                    ),
                    "rows_total": sum(
                        pq.read_metadata(p).num_rows for p in post
                    ),
                }
            )

    return merge_batch


def read_warehouse(spark, table_dir: str) -> DataFrame:
    """The merged warehouse table at its latest committed snapshot."""
    return tl.read_snapshot(spark, table_dir)
