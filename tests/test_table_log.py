"""Snapshot/commit semantics (sources/table_log.py): append /
overwrite / compact / vacuum, time travel across all of them, commit
atomicity under a version race, and torn-state behavior."""

from __future__ import annotations

import os

import pytest

import pyspark.sql.functions as F

from candy_store_etl_spark.sources import table_log as tl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, i * 10) for i in ids], "doc_id long, n_chars long"
    )


def _rows(spark, table, version=None):
    return sorted(
        (r.doc_id, r.n_chars)
        for r in tl.read_snapshot(spark, table, version=version).collect()
    )


def test_append_overwrite_compact_time_travel(spark, table):
    v0 = tl.append(_df(spark, [1, 2]), table)
    v1 = tl.append(_df(spark, [3]), table)
    v2 = tl.overwrite(_df(spark, [9]), table)
    v3 = tl.compact(spark, table)
    assert (v0, v1, v2, v3) == (0, 1, 2, 3)
    assert _rows(spark, table, 0) == [(1, 10), (2, 20)]
    assert _rows(spark, table, 1) == [(1, 10), (2, 20), (3, 30)]
    assert _rows(spark, table, 2) == [(9, 90)]
    assert _rows(spark, table, 3) == [(9, 90)]
    assert _rows(spark, table) == [(9, 90)]  # latest = post-compact
    # compact actually compacted: one live data file
    assert len(tl.snapshot_files(table)) == 1
    # ops recorded in order
    assert [e["op"] for e in tl.log_entries(table)] == [
        "append", "append", "overwrite", "compact",
    ]


def test_version_race_has_one_winner(spark, table, monkeypatch):
    tl.append(_df(spark, [1]), table)
    # freeze the version derivation at the pre-race snapshot: both
    # committers believe version 1 is next — O_CREAT|O_EXCL must let
    # exactly one through
    monkeypatch.setattr(tl, "current_version", lambda _d: 0)
    assert tl.commit(table, add=[], op="winner") == 1
    with pytest.raises(tl.ConcurrentCommitError):
        tl.commit(table, add=[], op="loser")
    monkeypatch.undo()
    # the loser retries against the refreshed log and succeeds
    assert tl.commit(table, add=[], op="retry") == 2


def test_vacuum_destroys_only_pre_horizon_history(spark, table):
    tl.append(_df(spark, [1, 2]), table)
    tl.overwrite(_df(spark, [5]), table)
    removed = tl.vacuum(table, retain_from_version=1)
    assert removed  # v0's files are gone...
    assert _rows(spark, table, 1) == [(5, 50)]  # ...v1 still reads
    with pytest.raises(Exception):
        _rows(spark, table, 0)  # v0 files deleted -> read fails
    # vacuum with full retention deletes nothing
    assert tl.vacuum(table, retain_from_version=0) == []


def test_read_empty_snapshot_raises(spark, table):
    tl.append(_df(spark, [1]), table)
    tl.commit(
        table,
        remove=[os.path.basename(p) for p in tl.snapshot_files(table)],
        op="delete-all",
    )
    with pytest.raises(ValueError, match="no data files"):
        tl.read_snapshot(spark, table)


def test_snapshot_scan_prunes_columns_and_pushes_filters(spark, table):
    """The snapshot read is a PLAIN parquet scan — pruning/pushdown
    must appear in the plan exactly as for any direct read."""
    tl.append(_df(spark, range(100)), table)
    df = tl.read_snapshot(spark, table).filter(F.col("doc_id") > 90).select(
        "n_chars"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,90)]" in plan
    assert "doc_id" in plan and "ReadSchema" in plan


def test_commit_stats_prune_from_log_alone(spark, table):
    """Iceberg-manifest shape: stats collected once at commit time let
    a range read plan from the log with zero read-time footer I/O —
    and losslessly (equal to the plain filtered scan)."""
    tl.append(_df(spark, range(0, 50)), table, stats_cols=["doc_id"])
    tl.append(_df(spark, range(50, 100)), table, stats_cols=["doc_id"])
    # disjoint-range compaction makes stats decisive
    tl.compact(
        spark, table, target_files=4, sort_by="doc_id",
        stats_cols=["doc_id"],
    )
    stats = tl.snapshot_file_stats(table)
    assert len(stats) == 4 and all(
        "doc_id" in e["cols"] for e in stats.values()
    )
    df, kept, total = tl.read_snapshot_pruned(spark, table, "doc_id", 10, 20)
    assert total == 4 and kept == 1  # one range file covers [10, 20]
    want = sorted(
        (r.doc_id, r.n_chars)
        for r in tl.read_snapshot(spark, table)
        .filter("doc_id between 10 and 20")
        .collect()
    )
    got = sorted((r.doc_id, r.n_chars) for r in df.collect())
    assert got == want and len(got) == 11


def test_stats_pruning_is_lossless_without_stats(spark, table):
    """Files committed WITHOUT stats are kept, never dropped."""
    tl.append(_df(spark, range(0, 10)), table)  # no stats_cols
    tl.append(_df(spark, range(10, 20)), table, stats_cols=["doc_id"])
    df, kept, total = tl.read_snapshot_pruned(spark, table, "doc_id", 2, 4)
    # stats-less files always kept; the stats'd file [10,19] pruned
    assert kept < total
    got = sorted(r.doc_id for r in df.collect())
    assert got == [2, 3, 4]


def test_pruned_read_of_empty_match_returns_empty_not_error(spark, table):
    tl.overwrite(_df(spark, range(5)), table, stats_cols=["doc_id"])
    df, kept, total = tl.read_snapshot_pruned(
        spark, table, "doc_id", 1000, 2000
    )
    assert kept == 0 and df.count() == 0
