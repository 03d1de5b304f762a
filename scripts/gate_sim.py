"""Full simulation of the external correctness gate over EVERY
registered query (the real driver truncates at 50): vanilla
SparkSession, DuckDB oracle views at sf0.01, pandas row
canonicalization + stringified value compare — the same shape the
driver uses (its canonicalizer sorts rows via pandas, which is why
registered plans must never emit raw list cells).

Usage:  python scripts/gate_sim.py [sf_dir] [query ...]
Prints one line per query and a final summary; exit code 1 on any bad.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from candy_store_etl_spark.caching import release_caches  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd  # noqa: F401

    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns))
    return df.reset_index(drop=True).astype(str)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad: list[str] = []
    for i, (name, fn) in enumerate(queries.items(), 1):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{i:3d} {name}: rows_only rows={len(sdf)}")
                continue
            ddf = con.execute(oracles[name]).df()
            s, d = _canon(sdf), _canon(ddf)
            if list(s.columns) != list(d.columns):
                bad.append(name)
                print(f"{i:3d} {name}: SCHEMA {list(s.columns)} != {list(d.columns)}")
            elif len(s) != len(d):
                bad.append(name)
                print(f"{i:3d} {name}: ROWS {len(s)} != {len(d)}")
            elif not s.equals(d):
                bad.append(name)
                neq = (s != d).any(axis=1)
                print(f"{i:3d} {name}: VALUES ({int(neq.sum())} rows differ)")
                print(s[neq].head(3).to_string())
                print(d[neq].head(3).to_string())
            else:
                print(f"{i:3d} {name}: ok rows={len(s)}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"{i:3d} {name}: ERROR {type(exc).__name__}: {exc}")
        finally:
            # queries cache/persist intra-plan relations through the
            # tracked-caching layer; release them (and clearCache as a
            # backstop) so a full catalog run doesn't accumulate cache
            release_caches()
            spark.catalog.clearCache()
    print(f"BAD={len(bad)} {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
