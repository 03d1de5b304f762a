"""Compute the driver-window re-confirmation backlog from the
cross-round CORRECTNESS artifacts.

The external driver hash-checks only the first 50 registered queries
per round; `plans/window.py::_WINDOW_PRIORITY` controls which. The
rotation policy (round-8 judge directive) is: cap NEW seats at ~15 and
give the remaining slots to STRICT oldest-evidence re-confirmation.
This script derives that ordering mechanically — per query, the
newest round whose CORRECTNESS row was green — so a rotation never
hand-counts the union again (rounds 8-10 each recomputed it by hand).

A row counts as GREEN if it hash-matched, or rows-matched with no
error / a documented ``no_oracle``. Queries in the registry with NO
green row ever (brand-new, or always-erroring) list separately.

Usage: python scripts/window_backlog.py [--limit N]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    # anchored to the repo root, NOT the CWD: run from anywhere, the
    # artifacts (and so the backlog) must be the same
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            err = row.get("err")
            ok = bool(row.get("hash_match")) or (
                bool(row.get("rows_match")) and err in (None, "no_oracle")
            )
            if err not in (None, "no_oracle"):
                ok = False
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    limit = None
    args = sys.argv[1:]
    if "--limit" in args:
        limit = int(args[args.index("--limit") + 1])

    from candy_store_etl_spark.plans.registry import (
        QUERIES,
        _ensure_loaded,
    )

    _ensure_loaded()
    green = latest_green()
    known = {n: r for n, r in green.items() if n in QUERIES}
    never = sorted(
        n
        for n, s in QUERIES.items()
        if n not in green and s.oracle is not None
    )
    rows_only = sorted(n for n, s in QUERIES.items() if s.oracle is None)

    by_round: dict[int, list[str]] = {}
    for n, r in known.items():
        by_round.setdefault(r, []).append(n)
    print(f"registry: {len(QUERIES)} queries "
          f"({len(QUERIES) - len(rows_only)} oracled)")
    print(f"driver-green at least once: {len(known)}")
    print(f"never driver-green (oracled, seat these or they stay "
          f"unchecked): {len(never)}")
    for n in never:
        print(f"  NEW  {n}")
    print(f"rows-only (do not seat; property-flag twins carry the "
          f"checks): {len(rows_only)}")
    print("\nbacklog, strict oldest-evidence first:")
    emitted = 0
    for r in sorted(by_round):
        names = sorted(by_round[r])
        print(f"-- last green r{r} ({len(names)}):")
        for n in names:
            print(f"  r{r}  {n}")
            emitted += 1
            if limit is not None and emitted >= limit:
                return


if __name__ == "__main__":
    main()
