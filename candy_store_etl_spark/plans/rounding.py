"""Re-export of the portable rounding helpers.

The canonical implementation lives in ``functions/rounding.py`` so
operators can import it without touching the plans package (whose
__init__ imports the whole query registry — a guaranteed cycle).
This module keeps the historical import path for every plan module.
"""

from __future__ import annotations

from ..functions.rounding import (  # noqa: F401
    SQL_FROUND,
    SQL_MONEY_SUM,
    fround,
    money_sum,
)

__all__ = ["SQL_FROUND", "SQL_MONEY_SUM", "fround", "money_sum"]
