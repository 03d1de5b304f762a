"""As-of (point-in-time) join via cogrouped-map pandas.

Spark's third grouped-pandas surface after grouped-map and
grouped-agg: ``left.groupBy(k).cogroup(right.groupBy(k))`` ships BOTH
sides' rows for a key to one ``pd.merge_asof`` call. Compared to the
tagged-union + ordered-window encoding (plans/advanced.py
purchase_asof_signup — same semantics, pure JVM), the cogrouped form
is the template for as-of logic that built-ins can't express (nearest
rather than backward match, tolerance bands, multi-column asof) at the
cost of one Arrow boundary.

Scale shape: one hash shuffle of each side on the key — identical to
the window encoding; per-key data must fit a pandas frame, the same
bound the window's per-partition sort already implies.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    out_col: str,
    schema: StructType,
    direction: str = "backward",
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """For each left row, attach the matching right timestamp
    (``direction='backward'``: latest right_ts <= left_ts)."""
    out_names = [f.name for f in schema.fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=out_names)
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            lpdf[out_col] = pd.Series(
                [pd.NaT] * len(lpdf), dtype=lpdf[left_ts].dtype
            )
            return lpdf[out_names]
        r = (
            rpdf[[right_ts]]
            .sort_values(right_ts, kind="mergesort")
            .rename(columns={right_ts: out_col})
        )
        merged = pd.merge_asof(
            lpdf,
            r,
            left_on=left_ts,
            right_on=out_col,
            direction=direction,
            tolerance=tolerance,
        )
        return merged[out_names]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema)
    )
