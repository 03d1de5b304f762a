"""Metadata-driven file pruning — a minimal Delta/Iceberg-style file
index over plain parquet directories.

Spark's parquet reader skips ROW GROUPS via pushed footer statistics,
but the file LISTING itself is not pruned for non-hive-partitioned
data: every file is opened for its footer even when its [min, max]
range cannot match. Table formats fix this with a stats manifest
consulted at planning time; this module is that consultation for a
directory of parquet files whose layout was produced by
``compact_files(sort_by=[key])`` or the Z-order pass — disjoint
per-file key ranges make file-level stats decisive.

At 100 TB the stats come from a persisted manifest (one row per file,
written at commit time), not a footer sweep; ``write_manifest`` /
``read_pruned`` model both halves. The footer sweep itself reads ~8 KB
per file of metadata — still far cheaper than scheduling a task per
file — and is driver-side metadata work, the same place Delta reads
its transaction log.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_stats_manifest.json"


def collect_file_stats(path: str, column: str) -> list[dict]:
    """Footer [min, max] of ``column`` per file (metadata-only)."""
    stats = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.read_metadata(f)
        names = md.schema.to_arrow_schema().names
        ci = names.index(column)
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(st.min)
            maxs.append(st.max)
        entry = {"file": f, "rows": md.num_rows}
        if mins:
            entry["min"] = min(mins)
            entry["max"] = max(maxs)
        stats.append(entry)
    return stats


def write_manifest(path: str, column: str) -> str:
    """Persist the per-file stats as the table's manifest (the
    commit-time step a real table format performs)."""
    manifest = {"column": column, "files": collect_file_stats(path, column)}
    out = os.path.join(path, MANIFEST_NAME)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return out


def read_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Scan only the files whose [min, max] intersects [lo, hi].

    Consults the persisted manifest when present (planning-time, no
    footer I/O), else sweeps footers. Files without stats are kept —
    pruning must never be lossy. The residual filter is still applied,
    so results equal ``spark.read.parquet(path).filter(...)`` exactly;
    only the file list shrinks.
    """
    mpath = os.path.join(path, MANIFEST_NAME)
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest["column"] != column:
            raise ValueError(
                f"manifest indexes {manifest['column']!r}, not {column!r}"
            )
        entries = manifest["files"]
    else:
        entries = collect_file_stats(path, column)

    keep = [
        e["file"]
        for e in entries
        if "min" not in e or not (_lt(hi, e["min"]) or _lt(e["max"], lo))
    ]
    from pyspark.sql import functions as F

    schema = spark.read.parquet(path).schema
    if not keep:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*keep)
        .filter((F.col(column) >= lo) & (F.col(column) <= hi))
    )


def _lt(a, b) -> bool:
    """Compare stats values that may round-trip through JSON as str."""
    if isinstance(a, str) or isinstance(b, str):
        return str(a) < str(b)
    return a < b
