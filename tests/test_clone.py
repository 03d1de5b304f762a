"""Zero-copy snapshot clones (table_log.clone_table): hardlinked data
files + one metadata commit carrying schema, stats, sketches, and the
bucket layout — independent logs from v0 on, POSIX link counts as the
cross-table refcount."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.sources import table_log as tl


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, tag string, n long")


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    tl.append(
        _mk(spark, [(i, f"t{i % 3}", i) for i in range(20)]).coalesce(2),
        src,
        stats_cols=["id"],
        bloom_cols=["tag"],
    )
    v = tl.clone_table(src, dst)
    assert v == 0
    got = sorted(map(tuple, tl.read_snapshot(spark, dst).collect()))
    want = sorted(map(tuple, tl.read_snapshot(spark, src).collect()))
    assert got == want
    # zero-copy: every clone file shares its source inode
    for p in tl.snapshot_files(dst):
        s = os.stat(p)
        assert s.st_nlink >= 2
        assert s.st_ino == os.stat(
            os.path.join(src, os.path.basename(p))
        ).st_ino
    # stats AND sketches ride the clone commit: both pruning classes
    # plan against the clone exactly as against the source
    _, kept, total = tl.read_snapshot_pruned(spark, dst, "id", 0, 5)
    assert kept < total
    df, kept, _ = tl.read_snapshot_membership_pruned(
        spark, dst, "tag", ["no-such-tag"]
    )
    assert kept == 0


def test_clone_time_travel_and_independence(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    tl.append(_mk(spark, [(1, "a", 1)]).coalesce(1), src)
    tl.append(_mk(spark, [(2, "b", 2)]).coalesce(1), src)
    # clone the PAST: v0 only
    tl.clone_table(src, dst, version=0)
    assert [r["id"] for r in tl.read_snapshot(spark, dst).collect()] == [1]
    # independence both ways: writes to one never appear in the other
    tl.append(_mk(spark, [(3, "c", 3)]).coalesce(1), dst)
    assert tl.read_snapshot(spark, src).count() == 2
    tl.append(_mk(spark, [(4, "d", 4)]).coalesce(1), src)
    assert tl.read_snapshot(spark, dst).count() == 2
    # vacuum in the SOURCE unlinks only its own names: the clone's
    # shared inodes survive and the clone still reads
    tl.overwrite(_mk(spark, [(9, "z", 9)]), src)  # src v3
    tl.vacuum(src, retain_from_version=3, grace_seconds=0)
    got = sorted(r["id"] for r in tl.read_snapshot(spark, dst).collect())
    assert got == [1, 3]


def test_clone_preserves_bucket_layout_for_serving(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import (
        serve,
        write_bucketed,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    rows = [
        (tenant * 100 + j, f"tenant{tenant}", j)
        for tenant in range(6)
        for j in range(10)
    ]
    write_bucketed(
        spark.createDataFrame(rows, "id long, tag string, n long"),
        src,
        key_col="tag",
        n_buckets=6,
    )
    tl.add_bloom_index(spark, src, ["id"])
    tl.clone_table(src, dst)
    assert tl.committed_bucket_spec(dst) == tl.committed_bucket_spec(src)
    # on-key probes plan against the carried spec...
    df, info = serve(
        spark, dst, ["tenant2"], key_col="tag", record_routes=False
    )
    assert df.count() == 10
    # ...and the carried sketches serve the off-key secondary lookup
    df, info = serve(
        spark, dst, [307], key_col="id", record_routes=False
    )
    assert info["route"] == "bloom-pruned"
    assert [r["tag"] for r in df.collect()] == ["tenant3"]


def test_clone_refuses_existing_table(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    tl.append(_mk(spark, [(1, "a", 1)]), src)
    tl.append(_mk(spark, [(2, "b", 2)]), dst)
    with pytest.raises(ValueError, match="refusing to clone"):
        tl.clone_table(src, dst)
