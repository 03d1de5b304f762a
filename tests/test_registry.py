"""Registry window integrity: the external driver verifies only the
first 50 registered queries, and `_WINDOW_PRIORITY` controls which —
a typo there silently drops a query out of the window, so every entry
must resolve and the window must be exactly the priority head."""

from __future__ import annotations

from candy_store_etl_spark.plans.registry import QUERIES, _ensure_loaded
from candy_store_etl_spark.plans.window import _WINDOW_PRIORITY

_ensure_loaded()


def test_every_priority_name_resolves():
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"_WINDOW_PRIORITY names not in registry: {missing}"


def test_priority_names_are_unique():
    assert len(set(_WINDOW_PRIORITY)) == len(_WINDOW_PRIORITY)


def test_registration_order_starts_with_priority():
    names = list(QUERIES)
    assert names[: len(_WINDOW_PRIORITY)] == list(_WINDOW_PRIORITY)


def test_driver_window_is_fully_covered():
    """EXACTLY 50 priority entries — the driver verifies only the first
    50 registered queries, so a 51st entry would silently fall outside
    the window while every other registry test stayed green."""
    assert len(_WINDOW_PRIORITY) == 50
