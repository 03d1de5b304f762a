"""Session-wide tracked caching.

Registered query plans cache/persist intermediates (signature
relations, edge lists, pipeline stages) that the RETURNED DataFrame
still references lazily — they cannot be unpersisted inside the query
function without forfeiting the reuse they exist for. Left alone, a
library consumer running many queries in one session accumulates every
query's cache (round-3 verdict: the gate-sim ``clearCache`` mitigation
"doesn't help library consumers embedding these plans").

The contract here: every cache/persist in a registered-query path goes
through ``tracked_cache``/``tracked_persist`` (enforced by
tests/test_plan_audit.py's source sweep), and any driver — gate sim,
bench, an embedding application — calls ``release_caches()`` after the
action that consumes the result. Memory growth is then bounded by one
query's working set instead of the whole catalog's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` that registers the relation for later release."""
    out = df.cache()
    _TRACKED.append(out)
    return out


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` that registers the relation for later release."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked relation (newest first). Returns the
    number released. Safe to call with no active SparkSession — a
    stopped-context unpersist is swallowed, the list still drains."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def tracked_count() -> int:
    return len(_TRACKED)
