"""Central query registry.

Each entry pairs a PySpark query (``fn(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle for DuckDB (``None`` for genuinely
non-SQL-expressible operators — those get rows-only verification).

Naming contract: every computed column is aliased identically in the
Spark plan and the oracle SQL, because the correctness gate sorts
columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules exactly once (they self-register) and
    apply the driver-window ordering. Both the loader import list and
    the window priority live in ``window.py`` (round-6 split): they
    affect registration ORDER, never a query's result, so keeping
    them out of this module — which is in every query's import
    closure — lets the incremental gate cache survive a window
    rotation."""
    global _LOADED
    if _LOADED:
        return
    from . import window

    window.ensure_loaded()
    _LOADED = True
