"""Quick per-query gate check: run the named registered queries
against the DuckDB oracle at sf0.01, driver-style.

Usage: python scripts/check_queries.py name1 name2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from candy_store_etl_spark.caching import release_caches  # noqa: E402
from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    _ensure_loaded()
    names = sys.argv[1:]
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # scale dirs (scripts/gen_scale_data.py) hold directory datasets
    suffix = "/*.parquet" if os.path.isdir(
        os.path.join(sf, "region.parquet")
    ) else ""
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet{suffix}')"
        )
    bad = []
    for name in names:
        try:
            spec = QUERIES[name]
            sdf = spec.fn(spark, sf)
            srows = sorted(
                tuple(str(x) for x in sorted(zip(sdf.columns, r), key=lambda p: p[0]))
                for r in sdf.collect()
            )
            if spec.oracle is None:
                print(f"{name}: rows-only rows={len(srows)}")
                continue
            res = con.execute(spec.oracle)
            cols = [d[0] for d in res.description]
            drows = sorted(
                tuple(str(x) for x in sorted(zip(cols, r), key=lambda p: p[0]))
                for r in res.fetchall()
            )
            if srows == drows:
                print(f"{name}: MATCH rows={len(srows)}")
            else:
                bad.append(name)
                print(f"{name}: MISMATCH spark={len(srows)} oracle={len(drows)}")
                sset, dset = set(srows), set(drows)
                for r in list(sset - dset)[:3]:
                    print("  spark-only:", r)
                for r in list(dset - sset)[:3]:
                    print("  oracle-only:", r)
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:300]}")
        finally:
            release_caches()
            spark.catalog.clearCache()
    print(f"BAD={len(bad)} {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
