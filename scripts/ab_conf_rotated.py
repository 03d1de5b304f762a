"""Session-rotated conf A/B (r13 verdict item 9): base vs candidate
session configuration, fresh session per sample, rotated B-A-A-B-A-B…
so session-warmup drift and ambient ramps hit both sides equally.
Per-side result is the MIN over sessions of per-session best-of-N.

Usage:
  python scripts/ab_conf_rotated.py "spark.io.compression.codec=zstd" \
      q1,q2,... [--sessions-per-side 3] [--reps 3] [--sf-dir DIR]

Prints one JSON line: per-query {base, cand, ratio_cand_over_base}
plus raw per-session numbers and the ambient/steal meters.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ambient_meter, _wait_for_quiet  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "ab_session_runner.py")


def _session(conf: str, names: str, sf_dir: str, reps: int) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_AB_CONF=conf)
    proc = subprocess.run(
        [sys.executable, RUNNER, names, sf_dir, str(reps)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT line:\n{proc.stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("conf", help='candidate confs, "k=v;k=v"')
    ap.add_argument("queries")
    ap.add_argument("--sessions-per-side", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    load = _wait_for_quiet()
    meter = _ambient_meter()
    order: list[str] = []
    for i in range(args.sessions_per_side):
        order += ["base", "cand"] if i % 2 == 0 else ["cand", "base"]
    sessions: dict[str, list[dict]] = {"base": [], "cand": []}
    for side in order:
        res = _session(
            args.conf if side == "cand" else "",
            args.queries,
            args.sf_dir,
            args.reps,
        )
        sessions[side].append(res)
        print(f"  session {side}: {res}", file=sys.stderr)
    summary = {}
    for q in args.queries.split(","):
        b = min(s[q] for s in sessions["base"])
        c = min(s[q] for s in sessions["cand"])
        summary[q] = {
            "base": b,
            "cand": c,
            "ratio_cand_over_base": round(c / b, 3) if b else None,
        }
    amb, steal = meter()
    print(json.dumps({
        "conf": args.conf,
        "summary": summary,
        "sessions": sessions,
        "ambient_load_1m": round(load, 2),
        "ambient_cpu_sec_during_run": round(amb, 1),
        "steal_cpu_sec_during_run": round(steal, 1),
    }))


if __name__ == "__main__":
    main()
