"""Query catalog: every operator from SURVEY.md §2 (plus the
large-scale-pipeline extensions) expressed as a named query over the
driver testdata, paired with a DuckDB oracle where SQL-expressible.
"""

from .registry import QUERIES, QuerySpec, oracle_sql_map, query_map

__all__ = ["QUERIES", "QuerySpec", "query_map", "oracle_sql_map"]
