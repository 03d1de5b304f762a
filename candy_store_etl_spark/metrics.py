"""EXPLAIN ANALYZE for the engine: executed-plan SQLMetrics, in Python.

Spark records per-operator runtime metrics (rows produced, shuffle
bytes, spill, broadcast sizes) on the EXECUTED physical plan, but only
surfaces them in the web UI. This module walks the plan tree over
py4j after an action and returns them as plain data, so tests — and
production health checks — can assert on what a query actually DID,
not just what its plan promised: "this join moved 200 bytes through
the shuffle, not 2 GB" is the difference between a broadcast join
working and silently degrading.

AQE wraps the tree in ``AdaptiveSparkPlanExec``/``QueryStageExec``
nodes whose subtree hangs off ``plan()``/``executedPlan()`` rather
than ``children()`` — the walker unwraps both, so callers see the
final (re-optimized) plan, the one that actually ran.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class NodeMetrics:
    depth: int
    node: str
    metrics: dict[str, int]


def executed_plan_metrics(df: DataFrame) -> list[NodeMetrics]:
    """Runtime metrics per physical operator, pre-order.

    Call AFTER an action has materialized ``df`` — metrics on an
    unexecuted plan are all zero. With AQE the tree is the final
    re-planned form (post broadcast-demotion, skew-split, coalesce).
    """
    plan = df._jdf.queryExecution().executedPlan()
    out: list[NodeMetrics] = []
    _walk(plan, 0, out)
    return out


def _walk(node, depth: int, out: list[NodeMetrics]) -> None:
    vals: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    out.append(NodeMetrics(depth=depth, node=node.nodeName(), metrics=vals))
    cls = node.getClass().getSimpleName()
    if (
        cls == "AdaptiveSparkPlanExec"
        or cls.endswith("QueryStageExec")
        or cls.endswith("QueryStage")
    ):
        for unwrap in ("plan", "executedPlan"):
            try:
                _walk(getattr(node, unwrap)(), depth + 1, out)
                return
            except Exception:  # noqa: BLE001 — fall through to children()
                continue
    cit = node.children().iterator()
    while cit.hasNext():
        _walk(cit.next(), depth + 1, out)


def metric_total(df: DataFrame, metric: str, *, node_contains: str = "") -> int:
    """Sum a named metric across operators (optionally filtered by node
    name substring) — e.g. ``metric_total(df, "shuffleBytesWritten")``
    is the query's total shuffle-write volume."""
    return sum(
        nm.metrics.get(metric, 0)
        for nm in executed_plan_metrics(df)
        if node_contains.lower() in nm.node.lower()
    )


# ---------------------------------------------------------------------------
# Formatted-plan-text property extraction — ONE definition shared by the
# enforcing audit (tests/test_plan_audit.py) and the published artifact
# (scripts/gen_plans.py -> PLANS.md), so the reviewable numbers can
# never drift from the enforced ones.
# ---------------------------------------------------------------------------


def count_unique_shuffles(tree: str) -> int:
    """Distinct shuffle Exchange operators in a formatted plan tree.

    Counts UNIQUE operator ids: the formatted tree re-prints a shared
    (e.g. cached) subtree under every consumer, so the same
    executed-once exchange can appear many times. BroadcastExchange is
    deliberately excluded (matched by the leading ``- Exchange``).

    Raises on simple-mode plan text (``Exchange hashpartitioning(...)``
    with no trailing operator id) — silently returning 0 there would
    make a shuffle-cap audit vacuously pass."""
    import re

    _assert_formatted_tree(tree)
    return len(set(re.findall(r"[+:]- Exchange[^(]*\((\d+)\)", tree)))


def _assert_formatted_tree(tree: str) -> None:
    """Every Exchange line in explain('formatted') output carries a
    trailing ``(id)``; simple-mode lines carry partitioning detail and
    ``[plan_id=..]`` instead. Reject the latter loudly."""
    import re

    for m in re.finditer(r"[+:]- (?:Broadcast)?Exchange[^\n]*", tree):
        if not re.search(r"\(\d+\)\s*$", m.group(0)):
            raise ValueError(
                "plan text is not explain('formatted') output — Exchange "
                f"line has no operator id: {m.group(0)!r}"
            )


def count_unique_broadcasts(tree: str) -> int:
    import re

    _assert_formatted_tree(tree)
    return len(set(re.findall(r"[+:]- BroadcastExchange[^(]*\((\d+)\)", tree)))
