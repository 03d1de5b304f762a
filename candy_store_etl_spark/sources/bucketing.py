"""Bucketed tables: pre-shuffled storage for co-located joins.

The single biggest repeated cost in a 100 TB star join is re-shuffling
the fact table on the same join key every query. Bucketing pays that
shuffle ONCE at write time: both sides stored with
``bucketBy(n, key)`` hash-partition their files identically, so an
equi-join on the bucket key plans as a zero-Exchange sort-merge join —
each task reads bucket *i* of both tables locally.

Rules that make it work (all encoded in ``write_bucketed``):
- identical bucket count on both sides (or an integer multiple);
- the join key must be the bucket key, same type both sides;
- ``sortBy`` within buckets lets the SMJ skip (or cheapen) its sort;
- tables must be read through the catalog (``spark.table``), not raw
  paths — bucket metadata lives in the table definition.

This is the batch twin of the streaming state-store partitioning, and
the storage-level alternative to the per-query ``repartition`` the
allocation operator does (operators/allocation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    key: str | list[str],
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table (parquet)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the planner to see bucket metadata."""
    return spark.table(table)
