"""Cross-check every oracle-backed query against DuckDB — a local mirror
of the driver's t2 correctness gate (row count + schema shape +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from candy_store_etl_spark.plans import QUERIES
from candy_store_etl_spark.plans.registry import _ensure_loaded
from candy_store_etl_spark.sources.tpch import TPCH_TABLES

_ensure_loaded()

ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows, colnames):
    """Sort columns by name, then rows, mimicking the driver compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # floats: quantize for sort stability; exactness asserted
                # separately below
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return [c for _, c in sorted(zip(range(len(colnames)), order))], out


def approx_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_correctness, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_correctness)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_correctness)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    _, s_norm = normalize(spark_rows, spark_cols)
    _, d_norm = normalize(duck_rows, duck_cols)
    mismatches = 0
    first = None
    for srow, drow in zip(s_norm, d_norm):
        for a, b in zip(srow, drow):
            if not approx_equal(a, b):
                mismatches += 1
                if first is None:
                    first = (srow, drow, a, b)
                break
    assert mismatches == 0, (
        f"{name}: {mismatches}/{len(s_norm)} mismatched rows; "
        f"first: spark={first[0]} duck={first[1]} ({first[2]!r} != {first[3]!r})"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_smoke, name):
    df = QUERIES[name].fn(spark, sf_smoke)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
