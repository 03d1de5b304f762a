"""Snapshot/commit semantics (sources/table_log.py): append /
overwrite / compact / vacuum, time travel across all of them, commit
atomicity under a version race, and torn-state behavior."""

from __future__ import annotations

import json
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


# ---- round 7: checkpoints, commit retry, vacuum grace, native reader


def test_checkpoint_bounds_replay_and_preserves_results(spark, table):
    """Snapshot resolution replays O(interval) tail commits after the
    auto-written checkpoint, NOT the whole log — and reads the same
    rows either way (checkpoint deleted = forced full replay)."""
    n_commits = tl.CHECKPOINT_INTERVAL + 3  # crosses one auto-checkpoint
    for i in range(n_commits):
        tl.append(_df(spark, [i]), table, stats_cols=["doc_id"])
    info = tl.snapshot_replay_info(table)
    assert info["checkpoint_version"] == tl.CHECKPOINT_INTERVAL
    # versions 0..12 exist; checkpoint at 10 -> replay 11, 12 only
    assert info["entries_replayed"] == n_commits - 1 - tl.CHECKPOINT_INTERVAL
    assert info["live_files"] > 0
    via_ckpt = _rows(spark, table)
    # time travel BELOW the checkpoint still full-replays correctly
    assert _rows(spark, table, 2) == [(0, 0), (1, 10), (2, 20)]
    # stats survive the checkpoint: pruning still plans from the log
    df, kept, total = tl.read_snapshot_pruned(spark, table, "doc_id", 5, 5)
    assert kept == 1 and total >= n_commits
    # delete the checkpoint + hint -> full replay gives identical rows
    os.remove(
        os.path.join(table, tl.LOG_DIR, f"{tl.CHECKPOINT_INTERVAL:08d}.checkpoint.json")
    )
    os.remove(os.path.join(table, tl.LOG_DIR, tl.LAST_CHECKPOINT))
    info = tl.snapshot_replay_info(table)
    assert info["checkpoint_version"] is None
    assert info["entries_replayed"] == n_commits
    assert _rows(spark, table) == via_ckpt


def test_stale_last_checkpoint_hint_is_advisory(spark, table):
    """A _last_checkpoint pointing past the requested version (or at a
    deleted file) falls back to the glob, never crashes or resolves
    the wrong snapshot."""
    for i in range(tl.CHECKPOINT_INTERVAL + 1):
        tl.append(_df(spark, [i]), table)
    # ask for a version BELOW the checkpointed one: hint is unusable
    info = tl.snapshot_replay_info(table, version=3)
    assert info["checkpoint_version"] is None
    assert info["entries_replayed"] == 4
    assert _rows(spark, table, 3) == [(i, i * 10) for i in range(4)]


def test_commit_with_retry_rederives_against_refreshed_log(
    spark, table, monkeypatch
):
    """The loser of a version race re-derives from the WINNER's
    snapshot: the derive callback sees the refreshed latest version on
    the retry attempt."""
    tl.append(_df(spark, [1]), table)
    real_commit = tl.commit
    interloper = {"done": False}

    def racing_commit(table_dir, **kw):
        # an interloping writer wins the version race exactly once:
        # their commit lands and ours surfaces as the loser's error
        if not interloper["done"]:
            interloper["done"] = True
            real_commit(table_dir, add=[], op="interloper")
            raise tl.ConcurrentCommitError("lost the race")
        return real_commit(table_dir, **kw)

    monkeypatch.setattr(tl, "commit", racing_commit)
    seen = []

    def derive(latest):
        seen.append(latest)
        return {"add": [], "op": f"derived-at-{latest}"}

    v = tl.commit_with_retry(table, derive)
    monkeypatch.undo()
    assert seen == [0, 1]  # re-derived against the interloper's commit
    assert v == 2
    assert tl.log_entries(table)[-1]["op"] == "derived-at-1"


def test_commit_with_retry_bounded_attempts(spark, table, monkeypatch):
    tl.append(_df(spark, [1]), table)
    tl.commit(table, add=[], op="occupier")  # version 1 exists
    monkeypatch.setattr(tl, "current_version", lambda _d: 0)  # always stale
    with pytest.raises(tl.ConcurrentCommitError):
        tl.commit_with_retry(table, lambda v: {"add": []}, max_attempts=3)


def test_vacuum_spares_young_unreferenced_files(spark, table):
    """The staged-rename race window: a data file present in the table
    dir but not yet referenced by any commit is NOT vacuumed while
    young; with grace 0 (or old mtime) it is reclaimed."""
    tl.append(_df(spark, [1, 2]), table)
    staged = os.path.join(table, "v00000001-999-part-inflight.parquet")
    with open(staged, "wb") as f:
        f.write(b"not-yet-committed")
    assert tl.vacuum(table) == []  # young + unreferenced -> protected
    assert os.path.exists(staged)
    # aged out of the grace window -> reclaimable orphan
    old = os.stat(staged).st_mtime - tl.VACUUM_GRACE_SECONDS - 10
    os.utime(staged, (old, old))
    assert tl.vacuum(table) == [os.path.basename(staged)]


def test_vacuum_reclaims_nonconvention_committed_names(spark, table):
    """Files added via the public commit(add=...) API outside the
    v*-* naming convention are vacuumable once unreferenced."""
    tl.append(_df(spark, [1]), table)
    extra = os.path.join(table, "external-file.parquet")
    _df(spark, [7]).coalesce(1).write.mode("overwrite").parquet(table + ".tmp")
    import glob as _g, shutil as _sh
    src = _g.glob(table + ".tmp/part-*.parquet")[0]
    _sh.move(src, extra)
    _sh.rmtree(table + ".tmp")
    tl.commit(table, add=["external-file.parquet"], op="external-add")
    tl.overwrite(_df(spark, [9]), table)  # drops it from the snapshot
    removed = tl.vacuum(table, retain_from_version=2)
    assert "external-file.parquet" in removed


def _register_table_log_source(spark):
    from candy_store_etl_spark.sources import table_log_source

    table_log_source.register(spark)


def test_native_reader_reads_snapshots_and_time_travels(spark, table):
    tl.append(_df(spark, [1, 2]), table)
    tl.overwrite(_df(spark, [9]), table)
    _register_table_log_source(spark)
    latest = spark.read.format("table_log").option("path", table).load()
    assert sorted((r.doc_id, r.n_chars) for r in latest.collect()) == [(9, 90)]
    v0 = (
        spark.read.format("table_log")
        .option("path", table)
        .option("version", 0)
        .load()
    )
    assert sorted((r.doc_id, r.n_chars) for r in v0.collect()) == [
        (1, 10),
        (2, 20),
    ]
    assert [f.name for f in latest.schema.fields] == ["doc_id", "n_chars"]


def test_native_reader_prunes_files_from_committed_stats(spark, table):
    """pushFilters turns committed [min,max] stats into planning-time
    FILE pruning (zero footer I/O), while handing every filter back to
    Spark so row-level semantics are exact."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from candy_store_etl_spark.sources.table_log_source import TableLogReader

    tl.append(_df(spark, range(0, 50)), table, stats_cols=["doc_id"])
    tl.append(_df(spark, range(50, 100)), table, stats_cols=["doc_id"])
    tl.compact(
        spark, table, target_files=4, sort_by="doc_id", stats_cols=["doc_id"]
    )
    reader = TableLogReader({"path": table})
    pushed = [
        GreaterThanOrEqual(("doc_id",), 10),
        LessThanOrEqual(("doc_id",), 20),
    ]
    returned = list(reader.pushFilters(pushed))
    assert returned == pushed  # all filters handed back: lossless
    parts = reader.partitions()
    assert len(parts) == 1  # 3 of 4 range files pruned from the log
    # end-to-end through the engine: values match the plain scan
    _register_table_log_source(spark)
    df = (
        spark.read.format("table_log")
        .option("path", table)
        .load()
        .filter("doc_id between 10 and 20")
    )
    got = sorted(r.doc_id for r in df.collect())
    assert got == list(range(10, 21))


def test_native_writer_append_and_overwrite_roundtrip(spark, table):
    """df.write.format('table_log'): task files + ONE atomic driver
    commit; append accumulates versions, overwrite swaps the snapshot,
    reads round-trip through the native reader, and time travel still
    sees pre-overwrite data."""
    _register_table_log_source(spark)

    def w(ids, mode):
        _df(spark, ids).write.format("table_log").option(
            "path", table
        ).mode(mode).save()

    w([1, 2], "append")
    w([3], "append")
    assert _rows(spark, table) == [(1, 10), (2, 20), (3, 30)]
    w([9], "overwrite")
    assert _rows(spark, table) == [(9, 90)]
    assert _rows(spark, table, 1) == [(1, 10), (2, 20), (3, 30)]
    ops = [e["op"] for e in tl.log_entries(table)]
    assert ops == ["append", "append", "overwrite"]
    via_reader = (
        spark.read.format("table_log").option("path", table).load()
    )
    assert sorted((r.doc_id, r.n_chars) for r in via_reader.collect()) == [
        (9, 90)
    ]


def test_native_writer_empty_partitions_write_no_files(spark, table):
    _register_table_log_source(spark)
    df = _df(spark, [1]).repartition(8)  # 7 empty partitions
    df.write.format("table_log").option("path", table).mode(
        "append"
    ).save()
    files = tl.snapshot_files(table)
    assert len(files) == 1  # empty tasks commit nothing
    assert _rows(spark, table) == [(1, 10)]


def test_commit_pins_base_version(spark, table):
    """A commit derived from a snapshot that is no longer latest must
    LOSE, not silently build over the interloper (post-r7 review: the
    check-and-set contract, not just mutual exclusion on one name)."""
    tl.append(_df(spark, [1]), table)  # v0
    base = tl.current_version(table)
    tl.commit(table, add=[], op="interloper")  # v1 lands after our read
    with pytest.raises(tl.ConcurrentCommitError):
        tl.commit(table, add=[], op="stale", base_version=base)
    # unpinned commits still take the next free slot
    assert tl.commit(table, add=[], op="unpinned") == 2


def test_commit_with_retry_detects_interloper_during_derive(spark, table):
    """The real race the retry loop exists for: a concurrent commit
    lands WHILE derive runs (not inside commit's own microsecond
    window). The pinned base version must surface it and re-derive —
    no monkeypatching, the genuine code path."""
    tl.append(_df(spark, [1]), table)  # v0
    fired = {"done": False}
    seen = []

    def derive(latest):
        seen.append(latest)
        if not fired["done"]:
            fired["done"] = True
            tl.commit(table, add=[], op="interloper")  # during derive
        return {"add": [], "op": f"derived-at-{latest}"}

    v = tl.commit_with_retry(table, derive)
    assert seen == [0, 1]  # stale derivation detected, re-derived
    assert v == 2
    assert tl.log_entries(table)[-1]["op"] == "derived-at-1"


def test_checkpoint_hint_only_advances(spark, table):
    """Checkpointing an OLD version (a time-travel aid) must not
    repoint _last_checkpoint below a newer checkpoint — that would
    silently regress latest-snapshot reads to a long replay."""
    for _ in range(2 * tl.CHECKPOINT_INTERVAL + 1):  # v0..v20
        tl.commit(table, add=[])
    assert (
        tl.snapshot_replay_info(table)["checkpoint_version"]
        == 2 * tl.CHECKPOINT_INTERVAL
    )
    tl.checkpoint(table, version=5)
    info = tl.snapshot_replay_info(table)
    assert info["checkpoint_version"] == 2 * tl.CHECKPOINT_INTERVAL
    # ...while the old-version checkpoint still accelerates time travel
    assert (
        tl.snapshot_replay_info(table, version=5)["checkpoint_version"] == 5
    )


def _cdf(spark, table):
    return (
        spark.readStream.format("table_log")
        .option("path", table)
        .option("changeFeed", "true")
        .load()
    )


def test_change_feed_emits_inserts_removes_skips_compact(spark, table):
    """The streaming change feed: adds stream as insert rows, an
    overwrite's removed snapshot as remove rows under the SAME
    version, and compact (layout-only) emits nothing."""
    _register_table_log_source(spark)
    tl.append(_df(spark, [1, 2]), table)  # v0
    tl.append(_df(spark, [3]), table)  # v1
    tl.overwrite(_df(spark, [9]), table)  # v2: +{9} -{1,2,3}
    tl.compact(spark, table)  # v3: skipped
    tl.append(_df(spark, [4, 5]), table)  # v4

    q = (
        _cdf(spark, table)
        .writeStream.format("memory")
        .queryName("tlog_cdf_scenario")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r._change_type, r._commit_version, r.doc_id)
        for r in spark.table("tlog_cdf_scenario").collect()
    )
    assert rows == [
        ("insert", 0, 1), ("insert", 0, 2), ("insert", 1, 3),
        ("insert", 2, 9), ("insert", 4, 4), ("insert", 4, 5),
        ("remove", 2, 1), ("remove", 2, 2), ("remove", 2, 3),
    ]
    # no version-3 (compact) rows anywhere
    assert all(v != 3 for _, v, _ in rows)


def test_change_feed_consumes_incrementally(spark, table, tmp_path):
    """Offsets are committed versions: a restarted reader with the
    same checkpoint reads ONLY the commits that landed since."""
    _register_table_log_source(spark)
    ckpt = str(tmp_path / "ckpt")
    tl.append(_df(spark, [1]), table)  # v0
    tl.append(_df(spark, [2]), table)  # v1

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can
        got = []
        q = (
            _cdf(spark, table)
            .writeStream.foreachBatch(
                lambda bdf, _bid: got.extend(
                    (r._commit_version, r.doc_id) for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert run() == [(0, 1), (1, 2)]
    tl.append(_df(spark, [7]), table)  # v2 lands after phase 1
    # the restarted reader sees only what landed since its checkpoint
    assert run() == [(2, 7)]


def test_change_feed_option_guards(spark, table):
    """changeFeed=true is the streaming face and streaming IS the
    change feed — both mismatches fail loudly, so the schema the user
    sees always matches the rows they get."""
    _register_table_log_source(spark)
    tl.append(_df(spark, [1]), table)
    with pytest.raises(Exception, match="STREAMING|streaming"):
        spark.read.format("table_log").option("path", table).option(
            "changeFeed", "true"
        ).load().collect()
    with pytest.raises(Exception, match="changeFeed"):
        (
            spark.readStream.format("table_log")
            .option("path", table)
            .load()
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_schema_evolution_additive_and_rejections(spark, table):
    """Commits record the writer's schema: adding a nullable column is
    legal (old files null-fill it on every read face, old versions
    keep their own schema for time travel); dropping or retyping a
    column fails the WRITE, not the eventual read."""
    _register_table_log_source(spark)
    tl.append(_df(spark, [1]), table)  # v0: (doc_id, n_chars)
    tl.append(
        spark.createDataFrame(
            [(2, 20, "en")], "doc_id long, n_chars long, lang string"
        ),
        table,
    )  # v1 adds lang
    assert [f.name for f in tl.snapshot_schema(table).fields] == [
        "doc_id", "n_chars", "lang",
    ]
    # library read: pre-evolution row null-fills lang
    assert sorted(
        (r.doc_id, r.lang) for r in tl.read_snapshot(spark, table).collect()
    ) == [(1, None), (2, "en")]
    # time travel keeps the v0 schema
    assert tl.read_snapshot(spark, table, version=0).columns == [
        "doc_id", "n_chars",
    ]
    # native reader pads Arrow batches the same way
    native = spark.read.format("table_log").option("path", table).load()
    assert sorted((r.doc_id, r.lang) for r in native.collect()) == [
        (1, None), (2, "en"),
    ]
    with pytest.raises(tl.SchemaEvolutionError, match="dropped"):
        tl.append(spark.createDataFrame([(3,)], "doc_id long"), table)
    with pytest.raises(tl.SchemaEvolutionError, match="retyped"):
        tl.append(
            spark.createDataFrame(
                [(3, "x", "en")], "doc_id long, n_chars string, lang string"
            ),
            table,
        )


def test_schema_evolution_through_change_feed_and_writer(spark, table):
    """The streaming feed pads pre-evolution files too, and the
    native writer records/validates schemas like the library path."""
    _register_table_log_source(spark)
    tl.append(_df(spark, [1]), table)  # v0
    spark.createDataFrame(
        [(4, 40, "fr")], "doc_id long, n_chars long, lang string"
    ).write.format("table_log").option("path", table).mode("append").save()
    q = (
        _cdf(spark, table)
        .writeStream.format("memory")
        .queryName("tlog_cdf_evo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(
        (r.doc_id, r.lang, r._commit_version)
        for r in spark.table("tlog_cdf_evo").collect()
    ) == [(1, None, 0), (4, "fr", 1)]
    # the writer's append validates evolution at commit (abort cleans
    # the staged task files)
    with pytest.raises(Exception, match="dropped"):
        spark.createDataFrame([(9,)], "doc_id long").write.format(
            "table_log"
        ).option("path", table).mode("append").save()


def test_vacuum_cdf_horizon_keeps_feed_servable(spark, table):
    """The change-feed retention contract: vacuum with cdf_horizon=H
    keeps every file commits AFTER H add OR remove (remove rows read
    the REMOVED file), so a consumer at offset H replays (H, latest]
    after the vacuum — while snapshot-only retention still reclaims
    what no consumer needs."""
    from candy_store_etl_spark.sources.table_log_source import (
        TableLogChangeFeedReader,
    )

    tl.append(_df(spark, [1, 2]), table)  # v0
    tl.overwrite(_df(spark, [9]), table)  # v1: +{9} -{v0 files}
    tl.append(_df(spark, [4]), table)  # v2
    v0_files = [
        os.path.basename(p) for p in tl.snapshot_files(table, version=0)
    ]
    deleted = tl.vacuum(
        table, retain_from_version=2, grace_seconds=0.0, cdf_horizon=0
    )
    # v0's files are v1's REMOVE set — a consumer at offset 0 still
    # needs them, so the horizon protects them
    assert not set(v0_files) & set(deleted)
    reader = TableLogChangeFeedReader({"path": table})
    parts = reader.partitions({"version": 0}, {"version": 2})
    assert parts and all(os.path.exists(p.path) for p in parts)


def test_feed_raises_retention_error_when_vacuumed_past(spark, table):
    """A consumer behind an unprotected vacuum gets a LOUD planning-
    time TableLogRetentionError naming the missing file, not a
    mid-batch executor read failure."""
    import pytest as _pytest

    from candy_store_etl_spark.sources.table_log import (
        TableLogRetentionError,
    )
    from candy_store_etl_spark.sources.table_log_source import (
        TableLogChangeFeedReader,
    )

    tl.append(_df(spark, [1, 2]), table)  # v0
    tl.overwrite(_df(spark, [9]), table)  # v1 removes v0's files
    deleted = tl.vacuum(table, retain_from_version=1, grace_seconds=0.0)
    assert deleted  # v0's files are gone
    reader = TableLogChangeFeedReader({"path": table})
    with _pytest.raises(TableLogRetentionError, match="cdf_horizon"):
        reader.partitions({"version": -1}, {"version": 1})
    # a consumer AHEAD of the vacuumed history is unaffected
    assert reader.partitions({"version": 1}, {"version": 1}) == []


def test_maybe_compact_triggers_only_past_threshold(spark, table):
    """Compaction scheduling is a metadata decision: below the file
    threshold maybe_compact is a no-op (no new version), above it one
    compact commit collapses the snapshot; contents never change."""
    for i in range(6):  # 6 appends x 1 file each
        tl.append(_df(spark, [i]).coalesce(1), table)
    v = tl.current_version(table)
    assert tl.maybe_compact(spark, table, max_files=8) is None
    assert tl.current_version(table) == v  # no-op left no commit
    got = tl.maybe_compact(spark, table, max_files=4)
    assert got == v + 1
    assert len(tl.snapshot_files(table)) == 1
    rows = sorted(r.doc_id for r in tl.read_snapshot(spark, table).collect())
    assert rows == [0, 1, 2, 3, 4, 5]
    # idempotent at the new layout
    assert tl.maybe_compact(spark, table, max_files=4) is None


def test_vacuum_auto_horizon_from_registered_consumers(spark, table):
    """cdf_horizon='auto' derives the retention horizon from the
    SLOWEST registered consumer; offsets only advance; with no
    registered consumers auto degrades to plain snapshot retention."""
    tl.append(_df(spark, [1, 2]), table)  # v0
    tl.overwrite(_df(spark, [9]), table)  # v1 removes v0's files
    v0_files = {
        os.path.basename(p) for p in tl.snapshot_files(table, version=0)
    }
    tl.set_cdf_consumer_offset(table, "slow", 0)
    tl.set_cdf_consumer_offset(table, "fast", 1)
    assert tl.cdf_consumer_offsets(table) == {"slow": 0, "fast": 1}
    # a stale writer cannot drag an offset backwards
    tl.set_cdf_consumer_offset(table, "fast", 0)
    assert tl.cdf_consumer_offsets(table)["fast"] == 1
    deleted = tl.vacuum(
        table, retain_from_version=1, grace_seconds=0.0,
        cdf_horizon="auto",
    )
    assert not v0_files & set(deleted)  # 'slow' at v0 still needs them
    # the slow consumer catches up -> auto horizon advances -> reclaim
    tl.set_cdf_consumer_offset(table, "slow", 1)
    deleted = tl.vacuum(
        table, retain_from_version=1, grace_seconds=0.0,
        cdf_horizon="auto",
    )
    assert v0_files <= set(deleted)


def test_refresh_pipeline_registers_landing_offset(spark, tmp_path):
    """run_landing_to_curated registers its consumer offset with the
    LANDING table, so an auto-horizon vacuum there is refresh-safe."""
    from candy_store_etl_spark.streaming.refresh import (
        run_landing_to_curated,
    )

    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    docs = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo", "en", "s", 30)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    tl.append(docs, landing)
    run_landing_to_curated(spark, landing, curated, str(tmp_path / "ck"))
    assert tl.cdf_consumer_offsets(landing) == {"curated-refresh": 0}


def test_pruned_read_plans_under_committed_schema(spark, table):
    """Round-8 ADVICE (medium): after an additive evolution,
    read_snapshot_pruned must plan under the COMMITTED schema — when
    stats pruning drops every post-evolution file, the evolved column
    must still appear (null-filled), exactly like the plain filtered
    snapshot scan it promises to equal."""
    tl.append(_df(spark, [1, 2]), table, stats_cols=["doc_id"])
    evolved = spark.createDataFrame(
        [(30, 300, "web")], "doc_id long, n_chars long, source string"
    )
    tl.append(evolved, table, stats_cols=["doc_id"])
    # range [1, 2] prunes the evolved file: only pre-evolution files
    # are read, and they must null-fill 'source'
    df, kept, total = tl.read_snapshot_pruned(spark, table, "doc_id", 1, 2)
    assert kept < total
    assert "source" in df.columns
    plain = tl.read_snapshot(spark, table).filter(
        "doc_id >= 1 AND doc_id <= 2"
    )
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the all-pruned schema-only branch carries the committed schema too
    empty, k0, _ = tl.read_snapshot_pruned(spark, table, "doc_id", -9, -5)
    assert k0 == 0
    assert empty.columns == df.columns
    assert empty.count() == 0


def test_append_schema_rides_pinned_and_revalidated(spark, table, monkeypatch):
    """Round-8 ADVICE: a schema-carrying append must not commit
    unpinned — a concurrent schema evolution landing between the
    fail-fast validation and the commit must be re-validated against,
    not silently overwritten by the stale schema."""
    tl.append(_df(spark, [1]), table)  # v0: (doc_id, n_chars)
    evolved_json = spark.createDataFrame(
        [(1, 1, "x")], "doc_id long, n_chars long, extra string"
    ).schema.json()
    real_stage = tl._stage_dataframe

    def stage_then_interlope(df, table_dir, hint):
        names = real_stage(df, table_dir, hint)
        # concurrent writer evolves the schema inside the window
        tl.commit(table_dir, add=[], op="interloper", schema=evolved_json)
        return names

    monkeypatch.setattr(tl, "_stage_dataframe", stage_then_interlope)
    # this append's (doc_id, n_chars) schema would DROP 'extra' if it
    # became the newest committed schema — re-validation at the pinned
    # commit base must refuse it
    with pytest.raises(tl.SchemaEvolutionError, match="extra"):
        tl.append(_df(spark, [2]), table)


def test_entries_between_reads_only_covered_versions(spark, table):
    """The change feed's per-trigger metadata read is ranged: only the
    commits the batch covers are opened, never the log from zero."""
    for i in range(4):
        tl.append(_df(spark, [i]), table)  # v0..v3
    assert [e["version"] for e in tl.entries_between(table, 1, 3)] == [2, 3]
    assert [e["version"] for e in tl.entries_between(table, -1, 0)] == [0]
    assert tl.entries_between(table, 3, 3) == []
    # proof the ranged read never touches commits at or below `after`:
    # with v0's json gone it still answers, while a from-zero replay
    # cannot
    os.remove(tl._version_path(table, 0))
    assert [e["version"] for e in tl.entries_between(table, 1, 3)] == [2, 3]
    with pytest.raises(FileNotFoundError):
        tl.log_entries(table)


def test_layout_only_flag_and_op_fallback():
    """New commits carry an explicit dataChange flag; pre-flag tables
    fall back to the known layout-only op names."""
    assert tl.layout_only({"op": "compact"})
    assert tl.layout_only({"op": "cdc-compact-bpf8"})
    assert tl.layout_only({"op": "anything", "dataChange": False})
    assert not tl.layout_only({"op": "append"})
    assert not tl.layout_only({"op": "cdc-batch-3"})


def test_change_feed_skips_cdc_relayout_commits(spark, table):
    """Round-8 ADVICE: a CDC warehouse layout coarsening
    (op cdc-compact-bpf{n}, dataChange=false) moves every byte of the
    table — the feed must emit NOTHING for it, or a consumer streams a
    full-table remove+insert for a rewrite that changed no contents."""
    import shutil

    _register_table_log_source(spark)
    tl.append(_df(spark, [1]), table)  # v0
    old = os.path.basename(tl.snapshot_files(table)[0])
    new = "relayout-0.parquet"
    shutil.copy(os.path.join(table, old), os.path.join(table, new))
    tl.commit(
        table, add=[new], remove=[old], op="cdc-compact-bpf8",
        data_change=False,
    )  # v1: layout-only
    tl.append(_df(spark, [2]), table)  # v2

    q = (
        _cdf(spark, table)
        .writeStream.format("memory")
        .queryName("tlog_cdf_relayout")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r._change_type, r._commit_version, r.doc_id)
        for r in spark.table("tlog_cdf_relayout").collect()
    )
    assert rows == [("insert", 0, 1), ("insert", 2, 2)]


# ---------------------------------------------------------------------------
# Multi-process commit storm: the O_EXCL contract under real races
# ---------------------------------------------------------------------------

_STORM_SCHEMA_A = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "a", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
)
_STORM_SCHEMA_B = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "a", "type": "long", "nullable": True, "metadata": {}},
            {"name": "b", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _storm_append(args):
    """One writer process: stage a real (pyarrow) data file, then
    commit it through the optimistic loop. Writers whose schema the
    table has evolved PAST retry with the evolved schema — the
    refresh-and-retry every real writer does. Returns
    (version, evolution_retried, race_retries)."""
    table, i, evolved = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from candy_store_etl_spark.sources import table_log as tlog

    name = f"v-storm-{i}.parquet"
    pq.write_table(
        pa.table({"k": [i], "a": [i * 2]}), os.path.join(table, name)
    )
    attempts = [0]

    def mk_derive(schema):
        def derive(base):
            attempts[0] += 1
            tlog._validate_evolution(
                None
                if base is None
                else tlog._resolve_snapshot(table, base)[2],
                schema,
            )
            return {"add": [name], "op": f"storm-{i}", "schema": schema}

        return derive

    schema = _STORM_SCHEMA_B if evolved else _STORM_SCHEMA_A
    evo_retried = False
    try:
        v = tlog.commit_with_retry(
            table, mk_derive(schema), max_attempts=200
        )
    except tlog.SchemaEvolutionError:
        # an evolved-schema commit landed first; refresh and retry
        evo_retried = True
        v = tlog.commit_with_retry(
            table, mk_derive(_STORM_SCHEMA_B), max_attempts=200
        )
    return v, evo_retried, attempts[0] - 1


def test_multiprocess_commit_storm(tmp_path):
    """24 OS processes race one table log: exactly 24 committed
    versions, every staged file live exactly once (no lost appends,
    no double-adds), and schema-evolution validation holds under
    interleaving — once the evolved schema lands, no stale-schema
    commit ever follows it (stale writers surface the error and
    refresh instead of silently regressing the table schema)."""
    from concurrent.futures import ProcessPoolExecutor

    table = str(tmp_path / "storm")
    os.makedirs(table)
    n = 24
    # 6 of 24 writers carry the evolved schema (adds nullable b)
    args = [(table, i, i % 4 == 3) for i in range(n)]
    with ProcessPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(_storm_append, args))

    assert tl.current_version(table) == n - 1
    versions = sorted(v for v, _, _ in results)
    assert versions == list(range(n))  # every writer won exactly one
    live = {os.path.basename(p) for p in tl.snapshot_files(table)}
    assert live == {f"v-storm-{i}.parquet" for i in range(n)}
    entries = tl.log_entries(table)
    adds = [a for e in entries for a in e["add"]]
    assert len(adds) == len(set(adds)) == n  # no double-adds
    # schema monotonicity: after the first B commit, only B commits
    n_fields = [len(json.loads(e["schema"])["fields"]) for e in entries]
    first_b = n_fields.index(3)
    assert all(f == 3 for f in n_fields[first_b:])
    # record contention for the notes (typically 20-40 retries on a
    # 32-core box); NOT asserted > 0 — on a slow/low-core machine the
    # writers can serialize, and the invariants above are the test
    race_retries = sum(r for _, _, r in results)
    print(f"storm race retries: {race_retries}")
    # the final snapshot resolves under the evolved schema
    schema = tl.snapshot_schema(table)
    assert [f.name for f in schema.fields] == ["k", "a", "b"]


def test_pinned_append_detects_concurrent_commit(spark, table):
    """append(base_version=...) is the check-and-set form for appends
    whose CONTENT was derived from a snapshot read (e.g. the neardup
    pairs anti-join): a commit landing after that read must surface as
    ConcurrentCommitError, never be silently built over."""
    df = spark.range(2).selectExpr("id")
    tl.append(df, table, op="seed")
    base = tl.current_version(table)

    # no interleaving: the pinned append lands at base + 1
    v = tl.append(df, table, op="pinned-ok", base_version=base)
    assert v == base + 1

    # a concurrent writer takes the next version between the caller's
    # snapshot read (base2) and its pinned append
    base2 = tl.current_version(table)
    tl.append(df, table, op="interloper")
    with pytest.raises(tl.ConcurrentCommitError):
        tl.append(df, table, op="stale", base_version=base2)
    # the loser's staged files are unreferenced and vacuum-sweepable;
    # the table still resolves and the interloper's rows are intact
    assert tl.current_version(table) == base2 + 1
    assert tl.read_snapshot(spark, table).count() == 6

    # pin-to-empty: base_version=None lands v0 on a fresh table
    fresh = table + "_fresh"
    assert tl.append(df, fresh, op="first", base_version=None) == 0


def test_manifest_publish_published_and_read(spark, table, tmp_path):
    """Cross-table manifest basics: published version lists fold over
    entries, read_published unions exactly the listed versions' files,
    and a stale-pinned publish raises instead of building over."""
    man = str(tmp_path / "man")
    t_a = table
    df = spark.range(3).selectExpr("id AS k")
    va0 = tl.append(df, t_a, op="x")
    assert tl.manifest_published(man) == {}
    tl.manifest_publish(man, {"a": va0}, op="batch-0", base_version=None)
    va1 = tl.append(df.selectExpr("k + 10 AS k"), t_a, op="x")
    dangling = tl.append(df.selectExpr("k + 99 AS k"), t_a, op="x")
    tl.manifest_publish(man, {"a": va1}, op="batch-1", base_version=0)
    pub = tl.manifest_published(man)
    assert pub == {"a": [va0, va1]}
    got = sorted(r.k for r in tl.read_published(spark, t_a, pub["a"]).collect())
    assert got == [0, 1, 2, 10, 11, 12]  # the dangling +99 rows unseen
    assert dangling not in pub["a"]
    # upto pins history
    assert tl.manifest_published(man, upto=0) == {"a": [va0]}
    # stale pin: another publish took version 2's slot
    tl.manifest_publish(man, {"a": dangling}, op="batch-2", base_version=1)
    with pytest.raises(tl.ConcurrentCommitError):
        tl.manifest_publish(man, {"a": va1}, op="late", base_version=1)
    # empty version list refuses loudly
    with pytest.raises(ValueError):
        tl.read_published(spark, t_a, [])


def test_manifest_published_cache_survives_same_path_rebuild(
    spark, table, tmp_path
):
    """manifest_published folds O(delta) through an in-process cache;
    a manifest rebuilt at the same path (equal-or-higher version,
    different entries) must invalidate it — the head-ENTRY identity
    validation, same contract as the dedup op-ledger cache."""
    import shutil

    man = str(tmp_path / "man")
    tl.manifest_publish(man, {"a": 0}, op="b0", base_version=None)
    tl.manifest_publish(man, {"a": 1}, op="b1", base_version=0)
    assert tl.manifest_published(man) == {"a": [0, 1]}

    # same-path rebuild at the SAME version count, different content
    shutil.rmtree(man)
    tl.manifest_publish(man, {"x": 5}, op="c0", base_version=None)
    tl.manifest_publish(man, {"x": 7}, op="c1", base_version=0)
    assert tl.manifest_published(man) == {"x": [5, 7]}
    # and upto still pins history through the cache
    assert tl.manifest_published(man, upto=0) == {"x": [5]}

    # rebuild landing LOWER
    shutil.rmtree(man)
    tl.manifest_publish(man, {"y": 9}, op="d0", base_version=None)
    assert tl.manifest_published(man) == {"y": [9]}

    # manifest deleted entirely
    shutil.rmtree(man)
    assert tl.manifest_published(man) == {}


def test_manifest_cache_catches_byte_identical_head_rebuild(
    spark, tmp_path
):
    """The review-confirmed defect the stat-identity fix closes:
    manifest entries are data-file-less (op + member version ints), so
    a same-path rebuild can replay a HEAD entry byte-identical to the
    dead incarnation's while publishing different history — entry
    equality cannot distinguish incarnations; the v0 commit file's
    stat identity can."""
    import shutil

    man = str(tmp_path / "man")
    tl.manifest_publish(man, {"pairs": 0}, op="b0", base_version=None)
    tl.manifest_publish(man, {"pairs": 1}, op="b1", base_version=0)
    assert tl.manifest_published(man) == {"pairs": [0, 1]}
    shutil.rmtree(man)
    # new incarnation: DIFFERENT v0, byte-identical v1 (same op, same
    # member version int)
    tl.manifest_publish(man, {"pairs": 7}, op="b0x", base_version=None)
    tl.manifest_publish(man, {"pairs": 1}, op="b1", base_version=0)
    assert tl.manifest_published(man) == {"pairs": [7, 1]}
