"""Committed per-file bloom membership sketches: the pruning class
[min, max] stats cannot provide (equality probes on columns the layout
doesn't cluster), carried inline in commit entries so planning needs
zero index I/O — the Delta bloom-filter-index / Iceberg-puffin role.

Contracts pinned here:
- losslessness: the membership-pruned read equals the plain filtered
  snapshot scan EXACTLY, across mixed coverage (bloomed + bloom-less
  files), nulls, and type-incomparable stats;
- pruning power: an absent value prunes every file; a value present in
  one slice opens (essentially) one file;
- composition: min/max and bloom prune independently (a value inside a
  file's range but not its membership set is still pruned);
- heterogeneity: per-file (m, k) recorded in the commit, so bitmaps of
  different sizes across commits probe correctly;
- persistence: sketches ride the per-file stats entry through
  checkpoints (cold resolve still prunes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from candy_store_etl_spark.sources import table_log as tl


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        rows, "id long, tag string, n long"
    )


def _probe_equal(spark, table_dir, column, values):
    """The lossless contract: membership-pruned result rows == plain
    filtered snapshot scan rows."""
    df, kept, total = tl.read_snapshot_membership_pruned(
        spark, table_dir, column, values
    )
    got = sorted((r["id"], r["tag"], r["n"]) for r in df.collect())
    plain = tl.read_snapshot(spark, table_dir).filter(
        F.col(column).isin(values)
    )
    want = sorted((r["id"], r["tag"], r["n"]) for r in plain.collect())
    assert got == want
    return kept, total


def test_bloom_prunes_absent_and_keeps_present(spark, tmp_path):
    t = str(tmp_path / "t")
    # 4 single-file appends, each holding ONE tag — the unclustered
    # layout a range test can't prune (no stats_cols committed at all)
    for i, tag in enumerate(["alpha", "beta", "gamma", "delta"]):
        tl.append(
            _mkdocs(
                spark, [(i * 10 + j, tag, j) for j in range(8)]
            ).coalesce(1),
            t,
            bloom_cols=["tag"],
        )
    # present value: exactly its own file opens (fp-free at this size)
    kept, total = _probe_equal(spark, t, "tag", ["gamma"])
    assert total == 4
    assert kept == 1
    # absent value: every file pruned, result empty but well-formed
    df, kept, total = tl.read_snapshot_membership_pruned(
        spark, t, "tag", ["omega"]
    )
    assert (kept, total) == (0, 4)
    assert df.count() == 0
    assert df.columns == ["id", "tag", "n"]
    # multi-value probe unions the per-value file sets
    kept, _ = _probe_equal(spark, t, "tag", ["alpha", "delta"])
    assert kept == 2


def test_bloom_lossless_across_mixed_coverage_and_nulls(spark, tmp_path):
    t = str(tmp_path / "t")
    # file 1: bloomed, contains nulls (excluded from the sketch)
    tl.append(
        spark.createDataFrame(
            [(1, "x", 1), (2, None, 2), (3, "y", 3)],
            "id long, tag string, n long",
        ).coalesce(1),
        t,
        bloom_cols=["tag"],
    )
    # file 2: NO bloom committed — must always be kept (lossless)
    tl.append(
        spark.createDataFrame(
            [(4, "z", 4), (5, "x", 5)], "id long, tag string, n long"
        ).coalesce(1),
        t,
    )
    kept, total = _probe_equal(spark, t, "tag", ["x"])
    assert total == 2
    assert kept == 2  # bloomed file matches; bloom-less file kept
    # a value only the bloom-less file could hold: bloomed file pruned
    kept, total = _probe_equal(spark, t, "tag", ["z"])
    assert (kept, total) == (1, 2)
    # nulls never match an equality probe and never poison the sketch
    df, _, _ = tl.read_snapshot_membership_pruned(
        spark, t, "tag", ["x"]
    )
    assert all(r["tag"] == "x" for r in df.collect())


def test_bloom_composes_with_minmax_stats(spark, tmp_path):
    t = str(tmp_path / "t")
    # one file, even ids 0..18: range [0, 18], membership = evens
    tl.append(
        _mkdocs(spark, [(i, "e", i) for i in range(0, 20, 2)]).coalesce(1),
        t,
        stats_cols=["id"],
        bloom_cols=["id"],
    )
    # inside the range but NOT a member: the bloom prunes what the
    # range test cannot
    df, kept, total = tl.read_snapshot_membership_pruned(
        spark, t, "id", [11]
    )
    assert (kept, total) == (0, 1)
    assert df.count() == 0
    # outside the range: min/max prunes without consulting the bitmap
    df, kept, _ = tl.read_snapshot_membership_pruned(
        spark, t, "id", [99]
    )
    assert kept == 0
    # a member passes both
    kept, _ = _probe_equal(spark, t, "id", [12])
    assert kept == 1


def test_bloom_heterogeneous_bitmap_sizes_across_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(
        _mkdocs(spark, [(1, "a", 1)]).coalesce(1),
        t,
        bloom_cols=["tag"],
        bloom_bits=1 << 13,
    )
    tl.append(
        _mkdocs(spark, [(2, "b", 2)]).coalesce(1),
        t,
        bloom_cols=["tag"],
        bloom_bits=1 << 15,
    )
    stats = tl.snapshot_file_stats(t)
    ms = sorted(e["bloom"]["tag"]["m"] for e in stats.values())
    assert ms == [1 << 13, 1 << 15]
    # probes take hash % m PER FILE, so both bitmaps answer correctly
    kept, total = _probe_equal(spark, t, "tag", ["a"])
    assert (kept, total) == (1, 2)
    kept, total = _probe_equal(spark, t, "tag", ["b"])
    assert (kept, total) == (1, 2)
    kept, total = _probe_equal(spark, t, "tag", ["a", "b"])
    assert kept == 2
    with pytest.raises(ValueError, match="power of two"):
        tl.append(
            _mkdocs(spark, [(3, "c", 3)]).coalesce(1),
            t,
            bloom_cols=["tag"],
            bloom_bits=1000,
        )


def test_bloom_survives_checkpoint_fold(spark, tmp_path):
    t = str(tmp_path / "t")
    # cross the auto-checkpoint interval so a cold resolve seeds from
    # the fold — the sketch must ride the folded stats entry
    for i in range(tl.CHECKPOINT_INTERVAL + 2):
        tl.append(
            _mkdocs(spark, [(i, f"t{i}", i)]).coalesce(1),
            t,
            bloom_cols=["tag"],
        )
    info = tl.snapshot_replay_info(t)
    assert info["checkpoint_version"] is not None
    df, kept, total = tl.read_snapshot_membership_pruned(
        spark, t, "tag", ["t3"]
    )
    assert total == tl.CHECKPOINT_INTERVAL + 2
    assert kept == 1
    assert [r["id"] for r in df.collect()] == [3]


def test_bloom_compact_recomputes_sketches(spark, tmp_path):
    t = str(tmp_path / "t")
    for i, tag in enumerate(["a", "b", "c", "d"]):
        tl.append(
            _mkdocs(spark, [(i, tag, i)]).coalesce(1),
            t,
            bloom_cols=["tag"],
        )
    # compact into 2 files, re-sketching: pruning stays exact on the
    # rewritten layout
    tl.compact(
        spark, t, target_files=2, sort_by="id",
        stats_cols=["id"], bloom_cols=["tag"],
    )
    kept, total = _probe_equal(spark, t, "tag", ["c"])
    assert total == 2
    assert kept == 1
    df, kept, _ = tl.read_snapshot_membership_pruned(
        spark, t, "tag", ["nope"]
    )
    assert kept == 0


def test_serve_routes_bloom_pruned_when_covered(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import serve

    t = str(tmp_path / "t")
    for i, tag in enumerate(["a", "b", "c", "d"]):
        tl.append(
            _mkdocs(
                spark, [(i * 10 + j, tag, j) for j in range(5)]
            ).coalesce(1),
            t,
            bloom_cols=["tag"],
        )
    df, info = serve(spark, t, ["c"], key_col="tag")
    assert info["route"] == "bloom-pruned"
    assert info["bloom_coverage"] == 1.0
    assert info["files_scanned"] == 1 and info["files_total"] == 4
    assert sorted(r["id"] for r in df.collect()) == [
        20, 21, 22, 23, 24,
    ]
    # probing a column with NO sketches: coverage 0, falls through to
    # the one-scan route — rows identical (route invisible in answer)
    df2, info2 = serve(spark, t, [22], key_col="id")
    assert info2["route"] == "scan-unbucketed"
    assert info2["bloom_coverage"] == 0.0
    assert [r["tag"] for r in df2.collect()] == ["c"]


def test_serve_bloom_route_rows_equal_scan_route(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import serve

    t = str(tmp_path / "t")
    for i, tag in enumerate(["a", "b", "a", "c"]):
        tl.append(
            _mkdocs(
                spark, [(i * 10 + j, tag, j) for j in range(5)]
            ).coalesce(1),
            t,
            bloom_cols=["tag"],
        )
    want_df, want_info = serve(
        spark, t, ["a"], key_col="tag", bloom_coverage_threshold=2.0
    )
    assert want_info["route"] == "scan-unbucketed"
    got_df, got_info = serve(spark, t, ["a"], key_col="tag")
    assert got_info["route"] == "bloom-pruned"
    assert got_info["files_scanned"] == 2  # 'a' lives in two files
    assert sorted(map(tuple, got_df.collect())) == sorted(
        map(tuple, want_df.collect())
    )


def test_add_bloom_index_in_place_no_rewrite(spark, tmp_path):
    t = str(tmp_path / "t")
    for i, tag in enumerate(["a", "b", "c"]):
        tl.append(
            _mkdocs(
                spark, [(i * 10 + j, tag, j) for j in range(6)]
            ).coalesce(1),
            t,
            stats_cols=["id"],
        )
    files_before = tl.snapshot_files(t)
    v = tl.add_bloom_index(spark, t, ["tag"])
    assert v == 3
    # stats-only: the data files are EXACTLY the ones already there
    assert tl.snapshot_files(t) == files_before
    entry = tl._read_entry(t, v)
    assert entry["add"] == [] and entry["remove"] == []
    assert entry.get("dataChange") is False
    # the restated entries CARRY the pre-existing [min, max]: range
    # pruning must survive the indexing commit
    df, kept, total = tl.read_snapshot_pruned(spark, t, "id", 0, 5)
    assert (kept, total) == (1, 3)
    # and membership pruning now works on the retrofit column
    kept, total = _probe_equal(spark, t, "tag", ["b"])
    assert (kept, total) == (1, 3)
    # time travel below the index commit still reads clean
    assert tl.read_snapshot(spark, t, version=2).count() == 18


def test_add_bloom_index_retrofits_bucketed_offkey_serving(
    spark, tmp_path
):
    from candy_store_etl_spark.operators.colocated import (
        serve,
        write_bucketed,
    )

    t = str(tmp_path / "t")
    # id is UNIQUE and functionally tied to the bucket key (tenant):
    # the canonical secondary-key lookup a hash layout cannot serve
    rows = [
        (tenant * 100 + j, f"tenant{tenant}", j)
        for tenant in range(8)
        for j in range(12)
    ]
    write_bucketed(
        spark.createDataFrame(rows, "id long, tag string, n long"),
        t,
        key_col="tag",
        n_buckets=8,
    )
    _, info = serve(spark, t, [307], key_col="id", record_routes=False)
    assert info["route"] == "scan-off-key"
    tl.add_bloom_index(spark, t, ["id"])
    df, info = serve(spark, t, [307], key_col="id", record_routes=False)
    assert info["route"] == "bloom-pruned"
    assert info["files_scanned"] == 1
    assert [r["tag"] for r in df.collect()] == ["tenant3"]
    # the bucket layout is untouched: on-key probes still plan
    # against the committed spec
    df, info = serve(
        spark, t, ["tenant5"], key_col="tag", record_routes=False
    )
    assert info["route"].startswith("scan") or info["route"] == "keyset"
    assert df.count() == 12


def test_sweep_point_only_fix_is_index_not_rewrite(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import serve
    from candy_store_etl_spark.orchestration import (
        MaintenanceTarget,
        maintenance_sweep,
    )

    t = str(tmp_path / "t")
    for i in range(2):
        tl.append(
            _mkdocs(
                spark, [(i * 10 + j, f"t{i}", j) for j in range(5)]
            ).coalesce(1),
            t,
        )
    for _ in range(3):
        serve(spark, t, ["t1"], key_col="tag")
    files_before = tl.snapshot_files(t)
    rep = maintenance_sweep(
        spark, [MaintenanceTarget(t, point_columns=("tag",))]
    )
    assert rep.tables[t]["action"] == "bloom-index@v2"
    assert rep.tables[t]["cleared"] is True
    # membership-only fix never rewrites data
    assert tl.snapshot_files(t) == files_before
    _, info = serve(spark, t, ["t1"], key_col="tag")
    assert info["route"] == "bloom-pruned"


def test_membership_maintenance_streak_hint_and_clear(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import (
        membership_maintenance_due,
        serve,
    )

    t = str(tmp_path / "t")
    for i in range(2):
        tl.append(
            _mkdocs(
                spark, [(i * 10 + j, f"t{i}", j) for j in range(5)]
            ).coalesce(1),
            t,
        )
    for n in (1, 2, 3):
        df, info = serve(spark, t, ["t1"], key_col="tag")
        assert info["route"] == "scan-unbucketed"
        due = membership_maintenance_due(t, "tag")
        assert due["scan_streak"] == n
        assert due["due"] is (n >= 3)
    # the tripping probe's own info carries the prescription
    assert "add_bloom_index" in info["maintenance_hint"]
    # the fix clears the hint IMMEDIATELY (no waiting for a re-probe)
    tl.compact(spark, t, target_files=2, bloom_cols=["tag"])
    due = membership_maintenance_due(t, "tag")
    assert due["due"] is False
    assert due["bloom_coverage"] == 1.0
    # and the next probe routes through the sketch, resetting the streak
    df, info = serve(spark, t, ["t1"], key_col="tag")
    assert info["route"] == "bloom-pruned"
    assert membership_maintenance_due(t, "tag")["scan_streak"] == 0


def test_ledger_kind_separation_range_vs_point(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import (
        maintenance_due,
        membership_maintenance_due,
        serve_range,
    )

    t = str(tmp_path / "t")
    tl.append(_mkdocs(spark, [(i, "x", i) for i in range(9)]), t)
    # three RANGE misses on column n: the range streak builds, the
    # point streak must stay untouched (their fixes differ)
    for _ in range(3):
        serve_range(spark, t, "n", 0, 2)
    assert maintenance_due(t, "n")["full_scan_streak"] == 3
    assert membership_maintenance_due(t, "n")["scan_streak"] == 0


def test_bloom_probe_contracts(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(
        _mkdocs(spark, [(1, "a", 1)]).coalesce(1),
        t,
        bloom_cols=["id", "tag"],
    )
    with pytest.raises(ValueError, match="empty probe"):
        tl.read_snapshot_membership_pruned(spark, t, "tag", [])
    with pytest.raises(ValueError, match="null probe"):
        tl.read_snapshot_membership_pruned(spark, t, "tag", ["a", None])
    # a probe the stored type can't represent fails LOUDLY (ANSI cast
    # — the keyset/point-lookup contract), never silently-empty. The
    # zero-job probe path folds the cast while building the inline
    # VALUES table, so the loud failure surfaces as
    # INVALID_INLINE_TABLE wrapping the cast error (previously the
    # bare CAST_INVALID_INPUT from the probe job)
    with pytest.raises(
        Exception, match="CAST_INVALID_INPUT|INVALID_INLINE_TABLE"
    ):
        tl.read_snapshot_membership_pruned(
            spark, t, "id", ["not-a-number"]
        )
    # self-review regression: an EMPTY probe set through the serving
    # front door stays a well-formed empty RESULT on a bloom-covered
    # table (the scan routes' isin([]) contract), never the
    # membership reader's empty-probe ValueError
    from candy_store_etl_spark.operators.colocated import serve

    df, info = serve(spark, t, [], key_col="tag", record_routes=False)
    assert df.count() == 0
    assert df.columns == ["id", "tag", "n"]
    assert info["route"] == "scan-unbucketed"
    # ...and a None AMONG the probes is dropped (matches nothing under
    # SQL equality) instead of becoming the bloom route's ValueError —
    # adding an index must never turn a tolerated input into a crash
    df, info = serve(
        spark, t, [None, "a"], key_col="tag", record_routes=False
    )
    assert info["route"] == "bloom-pruned"
    assert [r["tag"] for r in df.collect()] == ["a"]


def test_bloom_index_on_schema_evolved_table(spark, tmp_path):
    """Self-review regression: add_bloom_index plans its scan under
    the COMMITTED schema — on an evolved table some files predate the
    column, and footer sampling would fail to resolve it
    nondeterministically. Pre-evolution files null-fill, contribute
    no positions, and are therefore PRUNED for every probe (exact)."""
    t = str(tmp_path / "t")
    tl.append(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1), t
    )
    tl.append(
        spark.createDataFrame(
            [(3, "x"), (4, "y")], "id long, tag string"
        ).coalesce(1),
        t,
    )
    tl.add_bloom_index(spark, t, ["tag"])
    df, kept, total = tl.read_snapshot_membership_pruned(
        spark, t, "tag", ["x"]
    )
    assert total == 2
    assert kept == 1  # the pre-evolution file can hold no 'x'
    assert [r["id"] for r in df.collect()] == [3]


def test_membership_streak_target_above_default(spark, tmp_path):
    """Self-review regression: a caller's streak target ABOVE the
    module default must be reachable — the ledger walk saturates at
    the caller's target, not the constant (streak=5 used to cap at 3
    and never fire)."""
    from candy_store_etl_spark.operators.colocated import (
        membership_maintenance_due,
        serve,
    )

    t = str(tmp_path / "t")
    tl.append(_mkdocs(spark, [(i, "a", i) for i in range(4)]), t)
    for n in range(1, 6):
        serve(spark, t, ["a"], key_col="tag")
        due = membership_maintenance_due(t, "tag", streak=5)
        assert due["scan_streak"] == n
        assert due["due"] is (n >= 5)


def test_serve_read_only_table_still_serves(spark, tmp_path):
    """Self-review regression: the serving ledger is best-effort
    telemetry — probing a table on a read-only mount (ledger commit
    raises OSError) must still return rows; a read never fails
    because advisory state could not be written."""
    import os as _os

    from candy_store_etl_spark.operators.colocated import serve

    t = str(tmp_path / "t")
    tl.append(
        _mkdocs(spark, [(i, "a", i) for i in range(4)]).coalesce(1), t
    )
    _os.chmod(t, 0o555)
    try:
        df, info = serve(spark, t, ["a"], key_col="tag")
        assert df.count() == 4
        assert info["route"] == "scan-unbucketed"
    finally:
        _os.chmod(t, 0o755)
