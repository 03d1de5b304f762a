"""The orchestration-side maintenance sweep: one schedulable entry
point that polls every due/fix loop (range stats, membership sketches,
manifest-chain danglers) and runs exactly the prescribed fixes —
merging a table's due prescriptions into ONE rewrite, clearing its own
signals, and no-oping when nothing is due."""

from __future__ import annotations

import os

from candy_store_etl_spark.orchestration import (
    MaintenanceTarget,
    maintenance_sweep,
)
from candy_store_etl_spark.sources import table_log as tl


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, tag string, n long")


def _miss_probes(spark, t):
    """Three range misses on n + three point misses on tag — both
    ledgestreaks at the due threshold."""
    from candy_store_etl_spark.operators.colocated import serve, serve_range

    for _ in range(3):
        serve_range(spark, t, "n", 0, 2)
        serve(spark, t, ["t1"], key_col="tag")


def test_sweep_merges_fixes_and_clears(spark, tmp_path):
    from candy_store_etl_spark.operators.colocated import (
        maintenance_due,
        membership_maintenance_due,
        serve,
        serve_range,
    )

    t = str(tmp_path / "t")
    tl.append(
        _mk(spark, [(i, f"t{i % 3}", i) for i in range(30)]), t
    )  # no stats, no sketches
    _miss_probes(spark, t)
    target = MaintenanceTarget(
        t, range_columns=("n",), point_columns=("tag",), target_files=3
    )

    # dry run: reports both dues, touches nothing
    before = tl.current_version(t)
    rep = maintenance_sweep(spark, [target], dry_run=True)
    assert rep.tables[t]["due_range"] == ["n"]
    assert rep.tables[t]["due_point"] == ["tag"]
    assert rep.tables[t]["action"] is None
    assert tl.current_version(t) == before
    assert rep.acted is False

    # real sweep: ONE compact serves both prescriptions and clears them
    rep = maintenance_sweep(spark, [target])
    assert rep.acted is True
    assert rep.tables[t]["action"] == f"compact@v{before + 1}"
    assert rep.tables[t]["cleared"] is True
    assert tl.current_version(t) == before + 1
    assert maintenance_due(t, "n")["due"] is False
    assert membership_maintenance_due(t, "tag")["due"] is False

    # the workload now routes through the rewritten layout
    _, info = serve_range(spark, t, "n", 0, 2)
    assert info["route"] == "stats-pruned"
    _, info = serve(spark, t, ["t1"], key_col="tag")
    assert info["route"] == "bloom-pruned"

    # steady state: the next tick is a no-op
    rep = maintenance_sweep(spark, [target])
    assert rep.acted is False
    assert rep.tables[t]["action"] is None


def test_sweep_compact_preserves_earlier_point_fix(spark, tmp_path):
    """Self-review regression: a later range fix must not UNDO an
    earlier membership fix — the rewrite carries stats/sketches for
    every DECLARED column, not just the currently-due subset (a
    due-subset rewrite dropped the tag sketches, tag re-tripped, and
    the sweep oscillated fix/undo forever)."""
    from candy_store_etl_spark.operators.colocated import (
        membership_maintenance_due,
        serve,
        serve_range,
    )

    t = str(tmp_path / "t")
    tl.append(
        _mk(spark, [(i, f"t{i % 3}", i) for i in range(30)]), t
    )
    target = MaintenanceTarget(
        t, range_columns=("n",), point_columns=("tag",), target_files=3
    )
    # tick 1: only the point column trips -> in-place index
    for _ in range(3):
        serve(spark, t, ["t1"], key_col="tag")
    rep = maintenance_sweep(spark, [target])
    assert rep.tables[t]["action"].startswith("bloom-index")
    assert membership_maintenance_due(t, "tag")["bloom_coverage"] == 1.0
    # tick 2: the range column trips -> compact; tag coverage must
    # SURVIVE the rewrite
    for _ in range(3):
        serve_range(spark, t, "n", 0, 2)
    rep = maintenance_sweep(spark, [target])
    assert rep.tables[t]["action"].startswith("compact")
    assert membership_maintenance_due(t, "tag")["bloom_coverage"] == 1.0
    _, info = serve(spark, t, ["t1"], key_col="tag")
    assert info["route"] == "bloom-pruned"


def test_sweep_never_compacts_a_bucketed_layout(spark, tmp_path):
    """Self-review regression: a plain compact drops the committed
    bucket spec (every future on-key probe would lose the keyset/
    colocated routes), so a due range fix on a bucketed table is
    SURFACED, not executed — while point fixes still run (in-place
    indexing is layout-safe)."""
    from candy_store_etl_spark.operators.colocated import (
        serve,
        serve_range,
        write_bucketed,
    )

    t = str(tmp_path / "t")
    write_bucketed(
        _mk(spark, [(i, f"t{i % 3}", i) for i in range(40)]),
        t,
        key_col="id",
        n_buckets=4,
    )
    for _ in range(3):
        serve_range(spark, t, "n", 0, 5)
        serve(spark, t, ["t1"], key_col="tag")
    spec_before = tl.committed_bucket_spec(t)
    assert spec_before is not None
    rep = maintenance_sweep(
        spark,
        [MaintenanceTarget(t, range_columns=("n",), point_columns=("tag",))],
    )
    entry = rep.tables[t]
    assert "bucketed layout" in entry["skipped_range"]
    # the point fix still ran, in place
    assert entry["action"].startswith("bloom-index")
    assert tl.committed_bucket_spec(t) == spec_before
    _, info = serve(spark, t, ["t1"], key_col="tag")
    assert info["route"] == "bloom-pruned"


def test_sweep_runs_chain_vacuum_when_due(spark, tmp_path):
    ix = str(tmp_path / "index")
    man = os.path.join(ix, "manifest")
    sigs = os.path.join(ix, "signatures")
    tl.manifest_init(man)
    v = tl.append(
        spark.createDataFrame([(1, "a")], "id long, sig string"),
        sigs,
        op="b0",
    )
    tl.manifest_publish(
        man, {"signatures": v}, op="b0",
        base_version=tl.current_version(man),
    )
    dv = tl.append(
        spark.createDataFrame([(2, "b")], "id long, sig string"),
        sigs,
        op="b1-crashed",
    )
    # the sweep's chain pass honors the SAME grace window the chain
    # helpers use — a young dangler would be skipped; age this one
    # past the production default (the sweep takes no grace override
    # by design: schedulers should not be in the business of
    # shortening crash-safety windows)
    past = __import__("time").time() - tl.VACUUM_GRACE_SECONDS - 120
    os.utime(
        os.path.join(sigs, tl.LOG_DIR, f"{dv:08d}.json"), (past, past)
    )
    rep = maintenance_sweep(spark, [], chain_dirs=[ix], dry_run=True)
    assert rep.chains[ix]["due"] is True and rep.chains[ix]["ran"] is False
    rep = maintenance_sweep(spark, [], chain_dirs=[ix])
    assert rep.chains[ix]["ran"] is True
    assert len(rep.chains[ix]["deleted"]["signatures"]) >= 1
    # published rows untouched, signal cleared
    pub = tl.manifest_published(man)
    got = tl.read_published(spark, sigs, pub["signatures"]).collect()
    assert [(r["id"], r["sig"]) for r in got] == [(1, "a")]
    rep = maintenance_sweep(spark, [], chain_dirs=[ix])
    assert rep.chains[ix]["ran"] is False
