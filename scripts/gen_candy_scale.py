"""Derive scaled candy-pipeline datasets (10x / 100x transaction days)
from the reference's own dataset_5, so candy_pipeline_5_outputs gets a
measured scaling decade like every other headline query.

Each source day file is replicated ``--copies/10`` times; copy k keeps
its intra-day structure but shifts every timestamp (and the filename
date) by ``k * 10`` days and offsets transaction ids by
``k * 10**8`` — so scaled data has 10x/100x DISTINCT days and unique
order ids, exercising the same per-day grouping cardinality growth a
real longer history would. Products.csv is copied unchanged: more
volume over the same catalog is the realistic scale direction (the
pricing join stays broadcast-sized, as it would at 100 TB).

Null/absent timestamps and null item lists are passed through verbatim
— the scaled data must keep exercising the pipeline's null-handling
semantics.

Usage:
  python scripts/gen_candy_scale.py                       # 100 days → .scale/candy_sf1
  python scripts/gen_candy_scale.py --copies 100 --out .scale/candy_sf10
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil

SRC = "/root/reference/data/dataset_5"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scale/candy_sf1")
    args = ap.parse_args()

    days = sorted(
        f for f in os.listdir(SRC)
        if f.startswith("transactions_") and f.endswith(".json")
    )
    os.makedirs(args.out, exist_ok=True)
    shutil.copy(os.path.join(SRC, "products.csv"), args.out)

    loaded = {}
    for f in days:
        with open(os.path.join(SRC, f)) as fh:
            loaded[f] = json.load(fh)

    for k in range(args.copies):
        shift = dt.timedelta(days=10 * k)
        for f in days:
            base_date = dt.datetime.strptime(f[13:21], "%Y%m%d").date()
            new_date = base_date + shift
            rows = []
            for r in loaded[f]:
                r2 = dict(r)
                tid = r2.get("transaction_id")
                if isinstance(tid, int):
                    r2["transaction_id"] = tid + k * 10**8
                ts = r2.get("timestamp")
                if isinstance(ts, str):
                    try:
                        t = dt.datetime.fromisoformat(ts)
                        r2["timestamp"] = (t + shift).isoformat()
                    except ValueError:
                        pass  # malformed stays malformed
                rows.append(r2)
            name = f"transactions_{new_date.strftime('%Y%m%d')}.json"
            with open(os.path.join(args.out, name), "w") as fh:
                json.dump(rows, fh)
    n = len(days) * args.copies
    print(f"wrote {n} day files to {args.out}")


if __name__ == "__main__":
    main()
