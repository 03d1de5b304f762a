"""Deterministic time-series forecasting as a grouped-map operator.

Reference parity: `/root/reference/src/time_series.py` fits Prophet on
a driver-collected NumPy series (and — a bug we do NOT reproduce —
re-indexes history to end at *today*, making results depend on the run
date; `time_series.py:21`). This engine:

- fits on the REAL historical dates (deterministic),
- runs each metric's fit inside ``applyInPandas`` over the metric key,
  so all series fit in parallel on executors — collecting a daily
  aggregate to the driver is legitimate even at 100 TB source scale,
  but keeping it distributed costs nothing,
- uses a closed-form OLS trend + day-of-week seasonal decomposition
  (NumPy, seed-free, reproducible) instead of Prophet; if a Prophet
  installation is present it can be opted in via ``model="prophet"``.

In-sample MAE/MSE (reference `time_series.py:45-67`) are emitted per
metric alongside the forecast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not installed in this environment
    from prophet import Prophet  # type: ignore

    _HAVE_PROPHET = True
except Exception:  # pragma: no cover
    _HAVE_PROPHET = False

FORECAST_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("date", DateType(), False),
        StructField("forecast", DoubleType(), False),
        StructField("mae", DoubleType(), True),
        StructField("mse", DoubleType(), True),
    ]
)


def _fit_trend_seasonal(dates: pd.Series, y: np.ndarray, horizon: int):
    """OLS linear trend + weekday-mean seasonal residuals, closed form."""
    d = pd.to_datetime(dates)
    t = (d - d.min()).dt.days.to_numpy(dtype=np.float64)
    # trend — closed-form OLS (covariance/variance), the same formula
    # SQL engines implement as regr_slope/regr_intercept, so the DuckDB
    # oracle for the registered query agrees to within float noise
    # (np.polyfit's SVD route is mathematically identical but drifts
    # further in the last ulps)
    if len(y) >= 2 and np.ptp(t) > 0:
        tm, ym = t.mean(), y.mean()
        dt = t - tm
        slope = float((dt * (y - ym)).sum() / (dt * dt).sum())
        intercept = float(ym - slope * tm)
    else:
        slope, intercept = 0.0, float(np.mean(y))
    resid = y - (intercept + slope * t)
    # day-of-week seasonality (needs 2+ observations of a weekday to
    # matter; unseen weekdays get 0 adjustment)
    dow = d.dt.dayofweek.to_numpy()
    season = np.zeros(7)
    for k in range(7):
        mask = dow == k
        if mask.sum() >= 2:
            season[k] = float(resid[mask].mean())
    fitted = intercept + slope * t + season[dow]
    mae = float(np.mean(np.abs(y - fitted)))
    mse = float(np.mean((y - fitted) ** 2))
    last = d.max()
    future = [last + pd.Timedelta(days=i + 1) for i in range(horizon)]
    preds = [
        float(
            intercept
            + slope * ((f - d.min()).days)
            + season[f.dayofweek]
        )
        for f in future
    ]
    return future, preds, mae, mse


def forecast_metrics(
    daily: DataFrame,
    *,
    date_col: str,
    metric_cols: list[str],
    horizon: int = 1,
    model: str = "trend_seasonal",
) -> DataFrame:
    """Forecast each metric column ``horizon`` days past its last date.

    ``daily`` is an aggregated frame (one row per date); each metric
    becomes one group fitted independently in parallel.
    """
    if model == "prophet" and not _HAVE_PROPHET:
        raise NotImplementedError(
            "prophet is not installed in this environment; "
            "use model='trend_seasonal'"
        )

    # melt metrics → (metric, date, y): stack() stays JVM-side
    stack_expr = ", ".join(f"'{m}', CAST({m} AS DOUBLE)" for m in metric_cols)
    long = daily.selectExpr(
        f"CAST({date_col} AS DATE) AS ds",
        f"stack({len(metric_cols)}, {stack_expr}) AS (metric, y)",
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ds")
        y = pdf["y"].to_numpy(dtype=np.float64)
        if model == "prophet" and _HAVE_PROPHET:  # pragma: no cover
            m = Prophet()
            m.fit(pdf.rename(columns={"ds": "ds", "y": "y"}))
            fut = m.make_future_dataframe(periods=horizon)
            fc = m.predict(fut).tail(horizon)
            future, preds = list(fc["ds"]), list(fc["yhat"])
            mae = mse = None
        else:
            future, preds, mae, mse = _fit_trend_seasonal(
                pdf["ds"], y, horizon
            )
        return pd.DataFrame(
            {
                "metric": pdf["metric"].iloc[0],
                "date": [f.date() for f in future],
                "forecast": preds,
                "mae": mae,
                "mse": mse,
            }
        )

    return long.groupBy("metric").applyInPandas(fit, FORECAST_SCHEMA)


def forecast_wide(
    daily: DataFrame,
    *,
    date_col: str,
    metric_cols: list[str],
    horizon: int = 1,
) -> DataFrame:
    """Reference-shaped output: one row per future date, one column per
    metric (`sales_profit_forecast.csv`: date, forecasted_<metric>)."""
    long = forecast_metrics(
        daily, date_col=date_col, metric_cols=metric_cols, horizon=horizon
    )
    aggs = [
        F.round(
            F.first(F.when(F.col("metric") == m, F.col("forecast")), True), 2
        ).alias(f"forecasted_{m.removeprefix('total_')}")
        for m in metric_cols
    ]
    return long.groupBy("date").agg(*aggs).orderBy("date")
