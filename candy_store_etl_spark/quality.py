"""Data-quality constraint checks (the dbt-test / Deequ pattern).

Each check returns a VIOLATIONS DataFrame — empty means the constraint
holds — so callers can fail a pipeline, quarantine rows, or aggregate
counts into an audit report (``plans/warehouse.data_quality_audit``
does the latter, oracled against DuckDB). Every check is one
declarative aggregate/anti-join: at 100 TB they cost one scan each,
and the FK check is a broadcast/shuffle anti-join Catalyst plans like
any other join — no row-at-a-time validation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Key groups that occur more than once (empty == unique)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def check_not_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows where any of ``cols`` is NULL."""
    cond = None
    for c in cols:
        expr = F.col(c).isNull()
        cond = expr if cond is None else (cond | expr)
    return df.filter(cond)


def check_foreign_key(
    child: DataFrame, key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent (anti-join; empty == valid)."""
    return child.join(
        parent.select(F.col(parent_key).alias(key)).distinct(), key, "left_anti"
    )


def check_accepted_values(
    df: DataFrame, col: str, values: Sequence[str]
) -> DataFrame:
    """Rows whose ``col`` is outside the accepted set (NULL included)."""
    return df.filter(~F.col(col).isin(*list(values)) | F.col(col).isNull())


def check_expression(df: DataFrame, predicate: str) -> DataFrame:
    """Rows violating an arbitrary SQL predicate (empty == holds)."""
    return df.filter(~F.expr(predicate))
