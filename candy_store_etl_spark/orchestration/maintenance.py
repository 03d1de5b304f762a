"""The scheduled maintenance sweep: one poll-then-fix entry point for
every due/fix loop the engine exposes, so an orchestrator (an Airflow
task, a cron slot, the loop a deployment already runs OPTIMIZE in)
calls ONE function instead of tracking three polling protocols:

- range serving (``operators.colocated.maintenance_due``): a streak of
  full-scan-routed range probes + low [min, max] stats coverage →
  ``compact(sort_by=col, stats_cols=[col])``;
- point serving (``operators.colocated.membership_maintenance_due``):
  a streak of scan-routed point probes + low bloom coverage →
  ``add_bloom_index`` (stats-only in-place indexing; rides a compact
  instead when one is due anyway);
- maintained near-dup chains (``operators.dedup.chain_maintenance``):
  aged unpublished danglers past the vacuum grace window →
  ``manifest_vacuum`` over the eligible member tables.

Each loop's DECISION lives with its operator (the ledgers and
coverage reads are theirs); this module only sequences them, merges
per-table prescriptions into one rewrite, and reports what it did.
Everything here is a no-op when nothing is due — safe to run on every
schedule tick, which is the whole point of the due/fix shape: the
workload's own route history decides when a rewrite pays, the
scheduler just has to keep asking.

At 100 TB each fix is one layout rewrite of one table (a compact is a
single atomic commit; readers at pinned versions are untouched) or a
metadata-only dangler sweep — the sweep never scans tables that are
not due.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class MaintenanceTarget:
    """One serving table the sweep watches: which columns its workload
    range-probes and point-probes (the ledgers record the actual
    routes; this only declares what to POLL), and the layout to
    rewrite into when a fix is due."""

    table_dir: str
    range_columns: tuple[str, ...] = ()
    point_columns: tuple[str, ...] = ()
    target_files: int = 8
    coverage_threshold: float = 0.5


@dataclass
class MaintenanceReport:
    """What one sweep saw and did, per table / chain."""

    tables: dict = field(default_factory=dict)
    chains: dict = field(default_factory=dict)

    @property
    def acted(self) -> bool:
        return any(t["action"] for t in self.tables.values()) or any(
            c["ran"] for c in self.chains.values()
        )


def maintenance_sweep(
    spark: SparkSession,
    targets: list[MaintenanceTarget] = (),
    chain_dirs: list[str] = (),
    *,
    dry_run: bool = False,
) -> MaintenanceReport:
    """Poll every target's due signals and run exactly the prescribed
    fixes. Per table, all due prescriptions merge into ONE commit: a
    due range column forces a rewrite anyway (``sort_by`` the first
    due range column — a rewrite can only cluster one key family —
    ``stats_cols`` for every due range column), so due point columns
    ride it as ``bloom_cols``; with only point columns due, the fix
    is ``add_bloom_index`` — sketch the existing files in place, no
    rewrite at all. ``dry_run`` reports what WOULD run without
    touching anything — the orchestration-side preview."""
    from ..operators.colocated import (
        maintenance_due,
        membership_maintenance_due,
    )
    from ..operators.dedup import chain_maintenance, chain_maintenance_due
    from ..sources import table_log as tl

    report = MaintenanceReport()
    for t in targets:
        due_range = [
            c
            for c in t.range_columns
            if maintenance_due(
                t.table_dir, c, coverage_threshold=t.coverage_threshold
            )["due"]
        ]
        due_point = [
            c
            for c in t.point_columns
            if membership_maintenance_due(
                t.table_dir, c, coverage_threshold=t.coverage_threshold
            )["due"]
        ]
        entry = {
            "due_range": due_range,
            "due_point": due_point,
            "action": None,
            "cleared": None,
        }
        bucketed = tl.committed_bucket_spec(t.table_dir) is not None
        if due_range and bucketed:
            # a plain compact would DESTROY the bucket layout (the
            # rewrite carries no spec, so every future on-key probe
            # loses the keyset/colocated routes) — worse than the
            # full scans the fix would save. Surface it instead of
            # "fixing" it; re-bucketing with a different clustering
            # is a human decision, not a sweep's.
            entry["skipped_range"] = (
                "bucketed layout: compact would drop the bucket "
                "spec; re-cluster deliberately or serve ranges off a "
                "replica"
            )
            due_range = []
        if (due_range or due_point) and not dry_run:
            if due_range:
                # a rewrite is happening anyway — commit stats and
                # sketches for EVERY declared column, not just the
                # currently-due ones: a rewrite that carried only the
                # due subset would silently drop the coverage earlier
                # fixes established and oscillate (fix A undoes fix
                # B's sketches, B re-trips, repeat)
                version = tl.compact(
                    spark,
                    t.table_dir,
                    target_files=t.target_files,
                    sort_by=due_range[0],
                    stats_cols=list(t.range_columns),
                    bloom_cols=list(t.point_columns),
                )
                entry["action"] = f"compact@v{version}"
            else:
                # membership-only fix: index the existing files in
                # place (stats-only commit — zero write amplification,
                # and the only fix a bucketed layout can take). Only
                # the due columns: add_bloom_index MERGES into each
                # file's existing sketches, so unlike the compact it
                # cannot drop earlier fixes.
                version = tl.add_bloom_index(
                    spark, t.table_dir, due_point
                )
                entry["action"] = f"bloom-index@v{version}"
            # the due/fix contract: a fix clears its own signal
            # immediately (coverage is re-read from the new snapshot,
            # no re-probe needed) — a fix that doesn't is a bug worth
            # surfacing to the scheduler, not silently re-running
            entry["cleared"] = not (
                any(
                    maintenance_due(
                        t.table_dir, c,
                        coverage_threshold=t.coverage_threshold,
                    )["due"]
                    for c in due_range
                )
                or any(
                    membership_maintenance_due(
                        t.table_dir, c,
                        coverage_threshold=t.coverage_threshold,
                    )["due"]
                    for c in due_point
                )
            )
        report.tables[t.table_dir] = entry
    for d in chain_dirs:
        if dry_run:
            due = chain_maintenance_due(d)
            report.chains[d] = {
                "ran": False,
                "due": due["due"],
                "eligible": due["eligible"],
            }
        else:
            out = chain_maintenance(d)
            out.setdefault("due", out["ran"])
            report.chains[d] = out
    return report
