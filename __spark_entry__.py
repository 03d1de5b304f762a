"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``candy_store_etl_spark.plans`` (one entry per implemented operator
from SURVEY.md §2, DuckDB oracle wherever SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from candy_store_etl_spark.plans import oracle_sql_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fns = query_map()
    return fns["daily_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return oracle_sql_map()
