"""Partition-scoped CDC merge-upsert (streaming/cdc.py): parity with
the all-at-once batch aggregate, untouched-bucket byte-identity,
log-ledger idempotence, and rewrite volume proportional to touched
keys — the round-6 verdict's "would not survive 100x" item, closed."""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
import pytest

from candy_store_etl_spark.sources import table_log as tl
from candy_store_etl_spark.streaming.cdc import (
    applied_batches,
    make_partitioned_cdc_sink,
    read_warehouse,
)

N_BUCKETS = 32


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, value double")


def _increments(batch_df):
    return batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        ),
    )


def _sink(table, metrics=None):
    return make_partitioned_cdc_sink(
        table,
        _increments,
        key_col="user_id",
        add_cols=("n_events", "cents"),
        n_buckets=N_BUCKETS,
        metrics=metrics,
    )


def _file_digests(table):
    import glob

    out = {}
    for p in glob.glob(os.path.join(table, "b*.parquet")):
        with open(p, "rb") as f:
            out[os.path.basename(p)] = hashlib.md5(f.read()).hexdigest()
    return out


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "warehouse")


def test_merge_parity_with_batch_aggregate(spark, table):
    """Additive merges across micro-batches == one aggregate over the
    concatenated input (the ground truth a CDC warehouse converges
    to)."""
    batches = [
        [(u, float(u) + b) for u in range(b, 40, 3)] for b in range(4)
    ]
    sink = _sink(table)
    for i, rows in enumerate(batches):
        sink(_events(spark, rows), i)
    got = sorted(
        (r.user_id, r.n_events, r.cents)
        for r in read_warehouse(spark, table).collect()
    )
    all_rows = [r for b in batches for r in b]
    want = sorted(
        (r.user_id, r.n_events, r.cents)
        for r in _increments(_events(spark, all_rows)).collect()
    )
    assert got == want


def test_untouched_buckets_are_not_rewritten(spark, table):
    """A batch touching ONE key rewrites only that key's bucket: every
    other bucket's files keep their names, bytes, and inodes."""
    sink = _sink(table)
    sink(_events(spark, [(u, 1.0) for u in range(200)]), 0)  # seed: all
    before = _file_digests(table)
    inodes_before = {
        n: os.stat(os.path.join(table, n)).st_ino for n in before
    }
    metrics = []
    sink2 = _sink(table, metrics)
    sink2(_events(spark, [(7, 2.5)]), 1)  # touch exactly one key
    assert metrics[0]["touched_buckets"] == 1
    after = _file_digests(table)
    live = {os.path.basename(p) for p in tl.snapshot_files(table)}
    survivors = set(before) & live
    # exactly the touched bucket's files dropped out of the snapshot;
    # every other bucket's files carried over — same name, bytes, inode
    from candy_store_etl_spark.streaming.cdc import _group_of_name

    touched_b = {_group_of_name(n) for n in set(before) - survivors}
    assert len(touched_b) == 1
    assert survivors == {
        n for n in before if _group_of_name(n) not in touched_b
    }
    for n in survivors:
        assert after[n] == before[n]
        assert os.stat(os.path.join(table, n)).st_ino == inodes_before[n]
    # the merge itself is correct for the touched key
    row = (
        read_warehouse(spark, table)
        .filter(F.col("user_id") == 7)
        .collect()[0]
    )
    assert (row.n_events, row.cents) == (2, 100 + 250)


def test_log_is_the_idempotence_ledger(spark, table):
    """A retried epoch (same batch_id) is a no-op: the committed swap
    is the marker, so at-least-once foreachBatch delivery cannot
    double-apply."""
    sink = _sink(table)
    sink(_events(spark, [(1, 1.0), (2, 2.0)]), 0)
    v = tl.current_version(table)
    sink(_events(spark, [(1, 1.0), (2, 2.0)]), 0)  # redelivery
    assert tl.current_version(table) == v
    assert applied_batches(table) == {0}
    got = sorted(
        (r.user_id, r.n_events) for r in read_warehouse(spark, table).collect()
    )
    assert got == [(1, 1), (2, 1)]


def test_rewrite_volume_proportional_to_touched_keys(spark, table):
    """The at-scale property: a small batch's rewrite is bounded by
    its touched buckets, not the warehouse size."""
    metrics = []
    sink = _sink(table, metrics)
    sink(_events(spark, [(u, 1.0) for u in range(500)]), 0)  # seed
    sink(_events(spark, [(3, 1.0), (4, 1.0)]), 1)  # tiny update
    m = metrics[1]
    assert m["touched_buckets"] <= 2
    assert m["files_rewritten"] <= 2
    assert m["files_rewritten"] < m["files_total"] / 4
    assert m["rows_rewritten"] < m["rows_total"] / 4
    # time travel still works through the log: pre-update snapshot
    pre = tl.read_snapshot(spark, table, version=0)
    assert pre.filter("user_id = 3").collect()[0].n_events == 1


def test_streaming_integration_end_to_end(spark, table, tmp_path):
    """The sink driven by a real file-source stream (availableNow,
    maxFilesPerTrigger=1): N staged files -> N merge commits -> parity
    with the batch aggregate."""
    from candy_store_etl_spark.streaming.events import (
        run_stream_foreach_batch,
    )

    src = str(tmp_path / "feed")
    feed = _events(
        spark, [(u % 25, float(u % 7)) for u in range(300)]
    ).repartition(4)
    feed.write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_foreach_batch(
        stream, _sink(table), checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = sorted(
        (r.user_id, r.n_events, r.cents)
        for r in read_warehouse(spark, table).collect()
    )
    want = sorted(
        (r.user_id, r.n_events, r.cents)
        for r in _increments(spark.read.parquet(src)).collect()
    )
    assert got == want


def test_compaction_coarsens_layout_preserving_contents(spark, table):
    """compact_warehouse rewrites the snapshot into one file per
    group of buckets_per_file buckets in ONE atomic commit; contents
    and time travel are unchanged, file count collapses."""
    from candy_store_etl_spark.streaming.cdc import (
        compact_warehouse,
        layout_buckets_per_file,
    )

    sink = _sink(table)
    sink(_events(spark, [(u, 1.0 + u % 5) for u in range(300)]), 0)
    sink(_events(spark, [(u, 2.0) for u in range(0, 300, 7)]), 1)
    pre = sorted(tuple(r) for r in read_warehouse(spark, table).collect())
    files_before = len(tl.snapshot_files(table))
    v_pre = tl.current_version(table)
    compact_warehouse(
        spark, table, key_col="user_id", n_buckets=N_BUCKETS,
        buckets_per_file=8,
    )
    assert layout_buckets_per_file(table) == 8
    files_after = len(tl.snapshot_files(table))
    assert files_after <= -(-N_BUCKETS // 8)  # ceil(32/8) = 4 groups
    assert files_after < files_before
    post = sorted(tuple(r) for r in read_warehouse(spark, table).collect())
    assert post == pre
    # the pre-compaction version still time-travels (old fine layout)
    old = sorted(
        tuple(r)
        for r in tl.read_snapshot(spark, table, version=v_pre).collect()
    )
    assert old == pre


def test_sink_restart_honors_compacted_layout(spark, table):
    """A sink restarted over a compacted table resolves the grouping
    from the log: a one-key batch rewrites exactly ONE group file,
    the other group keeps its inode, and the merge stays correct."""
    from candy_store_etl_spark.streaming.cdc import compact_warehouse

    sink = _sink(table)
    sink(_events(spark, [(u, 1.0) for u in range(400)]), 0)
    compact_warehouse(
        spark, table, key_col="user_id", n_buckets=N_BUCKETS,
        buckets_per_file=16,  # 32 buckets -> 2 group files
    )
    inodes = {
        os.path.basename(p): os.stat(p).st_ino
        for p in tl.snapshot_files(table)
    }
    assert len(inodes) == 2
    metrics = []
    sink2 = _sink(table, metrics)  # fresh instance = restart
    sink2(_events(spark, [(7, 2.5)]), 1)
    m = metrics[0]
    assert m["buckets_per_file"] == 16
    assert m["touched_groups"] == 1
    assert m["files_rewritten"] == 1
    # rewrite amplification is the group, never the table
    assert m["rows_rewritten"] < m["rows_total"]
    live = {os.path.basename(p): p for p in tl.snapshot_files(table)}
    survivors = set(inodes) & set(live)
    assert len(survivors) == len(inodes) - 1
    for n in survivors:
        assert os.stat(live[n]).st_ino == inodes[n]
    row = (
        read_warehouse(spark, table)
        .filter(F.col("user_id") == 7)
        .collect()[0]
    )
    assert (row.n_events, row.cents) == (2, 100 + 250)


def test_live_sink_adopts_compacted_layout_without_restart(spark, table):
    """A LIVE sink (same instance, no restart) detects the foreign
    compaction commit by table version and re-resolves the grouping
    before its next merge — the silent-corruption path a stale cached
    layout would take (post-review fix)."""
    from candy_store_etl_spark.streaming.cdc import compact_warehouse

    metrics = []
    sink = _sink(table, metrics)
    sink(_events(spark, [(u, 1.0) for u in range(400)]), 0)
    assert metrics[-1]["buckets_per_file"] == 1
    compact_warehouse(
        spark, table, key_col="user_id", n_buckets=N_BUCKETS,
        buckets_per_file=16,  # -> 2 group files
    )
    sink(_events(spark, [(7, 2.5)]), 1)  # SAME instance
    m = metrics[-1]
    assert m["buckets_per_file"] == 16
    assert m["files_rewritten"] == 1
    assert m["files_total"] == 2
    row = (
        read_warehouse(spark, table)
        .filter(F.col("user_id") == 7)
        .collect()[0]
    )
    assert (row.n_events, row.cents) == (2, 100 + 250)
    # no duplicate keys anywhere (the failure mode of a stale layout)
    wh = read_warehouse(spark, table)
    assert wh.count() == wh.select("user_id").distinct().count()


def test_merge_parity_across_compaction(spark, table):
    """Merges before and after a mid-stream compaction converge to
    the same warehouse as one aggregate over the concatenated input."""
    from candy_store_etl_spark.streaming.cdc import compact_warehouse

    batches = [
        [(u, float(u % 9)) for u in range(b, 150, 2)] for b in range(4)
    ]
    sink = _sink(table)
    sink(_events(spark, batches[0]), 0)
    sink(_events(spark, batches[1]), 1)
    compact_warehouse(
        spark, table, key_col="user_id", n_buckets=N_BUCKETS,
        buckets_per_file=4,
    )
    sink2 = _sink(table)  # restart after maintenance
    sink2(_events(spark, batches[2]), 2)
    sink2(_events(spark, batches[3]), 3)
    got = sorted(
        (r.user_id, r.n_events, r.cents)
        for r in read_warehouse(spark, table).collect()
    )
    all_rows = [r for b in batches for r in b]
    want = sorted(
        (r.user_id, r.n_events, r.cents)
        for r in _increments(_events(spark, all_rows)).collect()
    )
    assert got == want


def test_null_merge_keys_merge_to_one_row(spark, table):
    """NULL is ONE merge key (the batch aggregate's null group), not a
    row that dodges the join and duplicates every batch (post-r7
    review: the merge join must be null-safe)."""
    batches = [
        [(None, 1.0), (7, 1.0), (None, 2.0)],
        [(None, 3.0), (7, 1.0)],
        [(None, 5.0)],
    ]
    sink = _sink(table)
    for i, rows in enumerate(batches):
        sink(_events(spark, rows), i)

    def keyed(rows):
        return sorted(
            ((r.user_id, r.n_events, r.cents) for r in rows),
            key=lambda t: (t[0] is not None, t[0] or 0),
        )

    got = keyed(read_warehouse(spark, table).collect())
    all_rows = [r for b in batches for r in b]
    want = keyed(_increments(_events(spark, all_rows)).collect())
    assert got == want
    assert sum(1 for t in got if t[0] is None) == 1


def test_warehouse_joins_colocated_with_bucketed_dim(spark, table, tmp_path):
    """The sink publishes its bucket spec + schema through the log, so
    the live warehouse is a first-class side of a storage-partitioned
    join: stream updates in, write a dim table bucketed with the same
    spec, and the co-located join matches the plain shuffle join."""
    from candy_store_etl_spark.operators import colocated as co

    sink = _sink(table)
    sink(_events(spark, [(u, float(u)) for u in range(40)]), 0)
    sink(_events(spark, [(u, 2.0 * u) for u in range(0, 40, 2)]), 1)
    assert co.bucket_spec(table) == {"key": "user_id", "n": N_BUCKETS}
    assert tl.snapshot_schema(table) is not None

    dim = spark.createDataFrame(
        [(u, f"tier{u % 3}") for u in range(0, 60, 2)],
        "user_id long, tier string",
    )
    dim_dir = str(tmp_path / "dim")
    co.write_bucketed(dim, dim_dir, key_col="user_id", n_buckets=N_BUCKETS)
    j = co.colocated_bucket_join(spark, table, dim_dir)
    got = sorted(
        (r.user_id, r.n_events, r.cents, r.tier) for r in j.collect()
    )
    want = sorted(
        (r.user_id, r.n_events, r.cents, r.tier)
        for r in read_warehouse(spark, table).join(dim, "user_id").collect()
    )
    assert got == want and len(got) == 20
