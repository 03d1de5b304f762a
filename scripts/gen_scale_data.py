"""Generate an sf1-equivalent dataset from the driver's sf0.1 tables.

The round-4 verdict asks for a MEASURED scaling curve ("a ~10x data ->
~10x time curve is the evidence a real scale review asks for") and the
driver only ships sf0.001/0.01/0.1. This script derives a 10x dataset
from sf0.1 by replication with key offsetting, preserving each
workload's character:

- TPC-H tables: every copy offsets its keys by the table's key stride,
  so join fan-outs, group cardinalities per key, and selectivities are
  IDENTICAL per copy — the workload scales by data volume only.
  region/nation stay single (dimensions; nationkeys in the fact copies
  still resolve).
- documents: doc_id offsets; copies k>0 SHUFFLE each document's words
  with a per-(copy, doc) seeded RNG. Length and vocabulary
  distributions are preserved, but 3-shingle sets are destroyed, so
  replicas are NOT near-duplicates of their originals — naive
  replication would plant 10-cliques in every MinHash bucket and blow
  the candidate-pair output quadratically, which is a different (and
  unfair) workload.
- embeddings: vec_id offsets; copies k>0 add seeded Gaussian noise
  (sigma = 0.3x the per-dim scale) so replicas land in the same space
  without being exact ties.
- events: event_id/user_id offsets — 10x users with the same per-user
  session structure.

Output: one DIRECTORY per table named <table>.parquet holding one
parquet file per copy, so Spark's scan gets >= 10 splits per table
(a single 100 MB file would be one split under the default
maxPartitionBytes and serialize the scan).

Usage: python scripts/gen_scale_data.py [--out /root/repo/.scale/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: stride_source_column} key-offset plan; stride is
# max(source column) + 1 so copies never collide
KEY_PLAN: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

# stride source table for foreign keys
STRIDE_TABLE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def _strides() -> dict[str, int]:
    out: dict[str, int] = {}
    for col, table in STRIDE_TABLE.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"), columns=[col])
        out[col] = int(t.column(col).to_numpy().max()) + 1
    return out


def _shuffle_words(texts: np.ndarray, doc_ids: np.ndarray, copy: int) -> list[str]:
    out = []
    for t, d in zip(texts, doc_ids):
        rng = np.random.default_rng((copy << 32) ^ int(d))
        words = t.split()
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def _perturb_embeddings(
    vecs: list[np.ndarray], vec_ids: np.ndarray, copy: int
) -> list[np.ndarray]:
    out = []
    for v, vid in zip(vecs, vec_ids):
        rng = np.random.default_rng((copy << 32) ^ int(vid))
        scale = float(np.abs(v).mean()) or 1.0
        out.append((v + rng.normal(0, 0.3 * scale, size=v.shape)).astype(np.float32))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument(
        "--copies", type=int, default=10,
        help="replication factor (10 -> sf1, 100 -> sf10)",
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset to generate (default: all) — the "
        "sf100 third-decade run only needs the tables its 3 queries "
        "scan, not 17 GB of everything",
    )
    ap.add_argument(
        "--plain-docs", action="store_true",
        help="skip the per-copy word shuffle for documents (REPLICAS "
        "BECOME NEAR-DUPLICATES: only valid for workloads that never "
        "run shingle-based dedup over this dataset; the shuffle is "
        "Python-side and dominates generation at 1000 copies)",
    )
    args = ap.parse_args()
    copies = args.copies
    strides = _strides()
    known = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    only = set(args.tables.split(",")) if args.tables else None
    if only is not None and only - known:
        # fail fast: a typo'd table name silently generating nothing
        # wastes a multi-hour sf100 run
        raise SystemExit(f"--tables: unknown {sorted(only - known)}")

    for table in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        if only is not None and table not in only:
            continue
        src = os.path.join(SRC, f"{table}.parquet")
        dst_dir = os.path.join(args.out, f"{table}.parquet")
        if os.path.isdir(dst_dir):
            shutil.rmtree(dst_dir)
        os.makedirs(dst_dir, exist_ok=True)
        base = pq.read_table(src)
        schema = base.schema
        if table in ("region", "nation"):
            pq.write_table(base, os.path.join(dst_dir, "part-0.parquet"))
            print(f"{table}: 1 copy ({base.num_rows} rows)")
            continue
        plan = KEY_PLAN[table]
        for k in range(copies):
            cols = {}
            for name in schema.names:
                arr = base.column(name)
                if name in plan:
                    stride = strides[plan[name]]
                    np_col = arr.to_numpy() + k * stride
                    cols[name] = pa.array(np_col, type=arr.type)
                elif (
                    table == "documents"
                    and name == "text"
                    and k > 0
                    and not args.plain_docs
                ):
                    ids = base.column("doc_id").to_numpy()
                    cols[name] = pa.array(
                        _shuffle_words(arr.to_numpy(), ids, k), type=arr.type
                    )
                elif table == "embeddings" and name == "embedding" and k > 0:
                    ids = base.column("vec_id").to_numpy()
                    vecs = [np.asarray(x, dtype=np.float32) for x in arr.to_pylist()]
                    cols[name] = pa.array(
                        [list(map(float, v)) for v in _perturb_embeddings(vecs, ids, k)],
                        type=arr.type,
                    )
                else:
                    cols[name] = arr
            t = pa.table(cols, schema=schema)
            pq.write_table(t, os.path.join(dst_dir, f"part-{k}.parquet"))
        print(f"{table}: {copies} copies ({base.num_rows * copies} rows)")


if __name__ == "__main__":
    main()
