"""Pinned-commit interleaved A/B — the only trustworthy cross-round
comparison on this box (absolute bench numbers move 30-70% between
machine-days, and foreign CPU bursts of 100-2000 cpu-s land mid-run;
NOTES rounds 5-11). Two detached git worktrees, one per commit; the
SAME session runner executes the SAME query list in ABAB-rotated
order so ambient drift hits both sides equally; per-side result is
the MIN over sessions of per-session best-of-N (the steady-state
number a resident engine delivers).

Usage:
  python scripts/ab_pinned_commits.py COMMIT_A COMMIT_B q1,q2,... \
      [--sessions-per-side 2] [--reps 3] [--sf-dir DIR]

Prints one JSON line: per-query {a, b, ratio_b_over_a} plus the
session-level raw numbers for auditability.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "ab_session_runner.py")


def _worktree(commit: str) -> str:
    path = f"/tmp/ab_wt_{commit[:12]}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return path


def _session(tree: str, names: str, sf_dir: str, reps: int) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [sys.executable, RUNNER, names, sf_dir, str(reps)],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT line from {tree}:\n{proc.stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("commit_a")
    ap.add_argument("commit_b")
    ap.add_argument("queries")
    ap.add_argument("--sessions-per-side", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    tree_a = _worktree(args.commit_a)
    tree_b = _worktree(args.commit_b)
    # ABBA rotation: if ambient load ramps monotonically during the
    # experiment, a plain ABAB order biases the same side every time
    order: list[tuple[str, str]] = []
    for i in range(args.sessions_per_side):
        order += (
            [("a", tree_a), ("b", tree_b)]
            if i % 2 == 0
            else [("b", tree_b), ("a", tree_a)]
        )
    sessions: dict[str, list[dict]] = {"a": [], "b": []}
    for side, tree in order:
        res = _session(tree, args.queries, args.sf_dir, args.reps)
        sessions[side].append(res)
        print(f"  session {side} ({os.path.basename(tree)}): {res}",
              file=sys.stderr)
    summary = {}
    for q in args.queries.split(","):
        a = min(s[q] for s in sessions["a"])
        b = min(s[q] for s in sessions["b"])
        summary[q] = {
            "a": a,
            "b": b,
            "ratio_b_over_a": round(b / a, 3) if a else None,
        }
    print(json.dumps({
        "commit_a": args.commit_a,
        "commit_b": args.commit_b,
        "summary": summary,
        "sessions": sessions,
    }))


if __name__ == "__main__":
    main()
