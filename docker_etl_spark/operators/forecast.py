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
import itertools
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


#: Defaults mirror the reference's fixed single-model path; the grid
#: search explores alternatives per segment (funnel_forecast.py:393).
_DEFAULT_PARAMS: dict = {"trend": "linear", "seasonality": "dow", "window_days": None}


def _fit_curve(pdf: pd.DataFrame, params: dict):
    """Fit one deterministic curve; return ``(predict(dates)->ndarray,
    sigma, fitted)`` for the training rows.

    The parameter space is the stand-in model's analogue of the
    reference's Prophet grid (funnel_forecast.py:309-435):

    - ``trend``: 'linear' (OLS slope) | 'flat' (mean level)
    - ``seasonality``: 'dow' (weekday residual offsets) | 'none'
    - ``window_days``: train on only the trailing N days — the
      changepoint analogue (recent-regime fit)

    Deterministic throughout: closed-form OLS + means, no RNG
    (base_forecast.py:152-160 seeded-determinism requirement).
    """
    pdf = pdf.sort_values("ds").reset_index(drop=True)
    if params.get("window_days"):
        cutoff = pdf["ds"].max() - pd.Timedelta(days=int(params["window_days"]))
        windowed = pdf[pdf["ds"] > cutoff]
        if len(windowed) >= 2:
            pdf = windowed.reset_index(drop=True)
    t0 = pdf["ds"].min()
    x = (pdf["ds"] - t0).dt.days.to_numpy(dtype="float64")
    y = pdf["y"].to_numpy(dtype="float64")
    n = len(y)
    if params.get("trend", "linear") == "linear" and n >= 2 and float(np.ptp(x)) > 0:
        slope, intercept = np.polyfit(x, y, 1)
    else:
        slope, intercept = 0.0, float(y.mean()) if n else 0.0
    trend = intercept + slope * x
    if params.get("seasonality", "dow") == "dow":
        resid = y - trend
        dows = pdf["ds"].dt.dayofweek.to_numpy()
        dow_offset = {
            d: float(resid[dows == d].mean()) if (dows == d).any() else 0.0
            for d in range(7)
        }
    else:
        dow_offset = {d: 0.0 for d in range(7)}

    def predict(dates: pd.DatetimeIndex | pd.Series) -> np.ndarray:
        dates = pd.DatetimeIndex(dates)
        fx = (dates - t0).days.to_numpy(dtype="float64")
        fdow = dates.dayofweek.to_numpy()
        return intercept + slope * fx + np.array([dow_offset[d] for d in fdow])

    fitted = predict(pd.DatetimeIndex(pdf["ds"]))
    sigma = float(np.std(y - fitted)) if n > 1 else 0.0
    return predict, sigma, pdf, fitted


#: Rolling-origin CV defaults (reference cv_settings: Prophet
#: cross_validation initial/period/horizon, funnel_forecast.py:356).
_DEFAULT_CV = {"initial_days": 60, "period_days": 14, "horizon_days": 14}


def rolling_origin_cv_bias(pdf: pd.DataFrame, params: dict, cv: dict) -> float:
    """Mean percent bias over the 3 most recent rolling-origin folds.

    The reference's CV metric verbatim in shape
    (funnel_forecast.py:344-363 _get_crossvalidation_metric): for
    each cutoff, train on ``ds <= cutoff``, predict the next
    ``horizon_days``, bias = sum(yhat)/sum(y) - 1; keep the mean of
    the last 3 cutoffs (``tail(3)``), closer to zero = better.
    """
    pdf = pdf.sort_values("ds").reset_index(drop=True)
    first, last = pdf["ds"].min(), pdf["ds"].max()
    horizon = pd.Timedelta(days=int(cv["horizon_days"]))
    period = pd.Timedelta(days=int(cv["period_days"]))
    cutoff = first + pd.Timedelta(days=int(cv["initial_days"]))
    biases: list[float] = []
    while cutoff + horizon <= last:
        train = pdf[pdf["ds"] <= cutoff]
        test = pdf[(pdf["ds"] > cutoff) & (pdf["ds"] <= cutoff + horizon)]
        if len(train) >= 2 and len(test) > 0 and float(test["y"].sum()) != 0.0:
            predict, _, _, _ = _fit_curve(train[["ds", "y"]], params)
            yhat = predict(pd.DatetimeIndex(test["ds"]))
            biases.append(float(yhat.sum()) / float(test["y"].sum()) - 1.0)
        cutoff = cutoff + period
    if not biases:
        return float("inf")
    return float(np.mean(biases[-3:]))


def grid_search_params(
    pdf: pd.DataFrame, param_grid: dict[str, list], cv: dict
) -> dict:
    """Expand the grid (itertools.product over listified values,
    funnel_forecast.py:385-393) and pick the argmin-|bias| candidate
    (funnel_forecast.py:406-409). Ties break on grid order, matching
    ``np.argmin`` semantics in the reference."""
    grid = {k: (v if isinstance(v, list) else [v]) for k, v in param_grid.items()}
    candidates = [
        dict(zip(grid.keys(), combo)) for combo in itertools.product(*grid.values())
    ]
    biases = [abs(rolling_origin_cv_bias(pdf, p, cv)) for p in candidates]
    return candidates[int(np.argmin(biases))]


def _fit_linear_dow(
    pdf: pd.DataFrame,
    horizon_days: int,
    z: float,
    params: dict | None = None,
) -> pd.DataFrame:
    """Fit one curve (default: linear trend + DOW offsets) and emit
    fitted history + ``horizon_days`` of forecast with ±z normal
    bands from the residual std."""
    predict, sigma, pdf, fitted = _fit_curve(pdf, params or _DEFAULT_PARAMS)
    last = pdf["ds"].max()
    future = pd.date_range(last + pd.Timedelta(days=1), periods=horizon_days, freq="D")
    fhat = predict(future)

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
    param_grid: dict[str, list] | None = None,
    cv_settings: dict | None = None,
) -> DataFrame:
    """Fit one model per segment and emit fitted history + forecast.

    The reference's FunnelForecast shape (funnel_forecast.py:75-156:
    segments from config → one Prophet per segment): here
    ``applyInPandas`` keyed by ``segment_cols`` — each group's pandas
    frame is one model's training set; Spark schedules segments
    across the cluster. Default horizon mirrors the reference's
    78-week default (base_forecast.py:152-160).

    With ``param_grid``, each segment auto-tunes its own model first:
    rolling-origin cross-validation over the grid's cartesian product
    picks the min-|percent-bias| candidate (funnel_forecast.py:309-435
    _auto_tuning + _get_crossvalidation_metric), entirely inside the
    segment's pandas group — tuning N segments × K candidates stays
    one Spark task per segment, so the cluster parallelizes across
    segments while each grid search remains local. A ``params``
    column records each segment's chosen candidate.
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
    if param_grid is not None:
        out_schema += ", params string"
    cv = {**_DEFAULT_CV, **(cv_settings or {})}
    norm = df.select(
        *segment_cols,
        F.col(date_col).cast("date").alias("ds"),
        F.col(value_col).cast("double").alias("y"),
    )

    def fit(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["ds"] = pd.to_datetime(pdf["ds"])
        cols = [*segment_cols, "ds", "yhat", "yhat_lower", "yhat_upper", "is_forecast"]
        if param_grid is not None:
            params = grid_search_params(pdf[["ds", "y"]], param_grid, cv)
            cols.append("params")
        else:
            params = None
        res = _fit_linear_dow(pdf[["ds", "y"]], horizon_days, z, params)
        for c, k in zip(segment_cols, keys):
            res[c] = k
        if param_grid is not None:
            res["params"] = repr(sorted(params.items()))
        res["ds"] = res["ds"].dt.date
        return res[cols]

    return norm.groupBy(*segment_cols).applyInPandas(fit, schema=out_schema)


def _hw_update_sql(alpha: float, beta: float, gamma: float, season: int) -> dict:
    """SQL fragments for one additive Holt-Winters update, shared by
    the JVM fold and (structurally) the DuckDB oracle. ``l_new`` is
    textually duplicated inside ``b``/``s`` (SQL lambdas have no let-
    binding); identical expression text → identical IEEE evaluation,
    which is what makes the recipe oracle-pairable. Complement
    coefficients are PRE-RENDERED literals (``1-alpha`` computed once
    in Python), so both engines parse the same decimal strings."""
    a, b_, g = repr(float(alpha)), repr(float(beta)), repr(float(gamma))
    ca, cb, cg = (
        repr(1.0 - float(alpha)),
        repr(1.0 - float(beta)),
        repr(1.0 - float(gamma)),
    )
    l_new = f"{a} * (y - element_at(acc.s, 1)) + {ca} * (acc.l + acc.b)"
    return {
        "l": l_new,
        "b": f"{b_} * (({l_new}) - acc.l) + {cb} * acc.b",
        "s": (
            f"concat(slice(acc.s, 2, {season - 1}), "
            f"array({g} * (y - ({l_new})) + {cg} * element_at(acc.s, 1)))"
        ),
    }


def holt_winters_forecast(
    df: DataFrame,
    segment_cols: Sequence[str],
    date_col: str = "ds",
    value_col: str = "y",
    horizon_days: int = 14,
    alpha: float = 0.5,
    beta: float = 0.1,
    gamma: float = 0.2,
    season: int = 7,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) per
    segment, as a PURE JVM expression fold — the engine-native
    forecasting backend next to :func:`fit_predict_segments`'s pandas
    models (reference analogue: the Prophet per-segment fit,
    kpi_forecasting/models/prophet_forecast.py:45-60, re-expressed as
    a deterministic closed recipe instead of an MCMC fit).

    Recipe (fixed, fully specified — that is what makes it
    ORACLE-PAIRABLE, f10): per segment order the series by date, then

    - init from the first two seasons: ``l0 = mean(y[0:m])``,
      ``b0 = (mean(y[m:2m]) - l0) / m``, ``s0[i] = y[i] - l0``;
    - fold every observation through the standard additive update
      ``l' = α(y - s_head) + (1-α)(l + b)``,
      ``b' = β(l' - l) + (1-β)b``,
      ``s'  = rotate(s) + [γ(y - l') + (1-γ)s_head]`` (the seasonal
      vector is a rotating queue, so no time index is threaded);
    - forecast ``h = 1..horizon``:
      ``yhat = l + h·b + s[(h-1) mod m]`` dated ``last_ds + h``.

    Execution shape: one groupBy collects each segment's series into
    a row (same per-segment-fits-in-memory contract as the pandas
    path — a segment is a time series, thousands of points at most),
    then everything is ``aggregate``/``transform`` HOFs — zero Python
    stages, zero extra shuffles beyond the one groupBy, and the fold
    is whole-stage-codegen-able. Parallelism is across segments,
    exactly like the reference's per-segment Prophet scheduling.

    Segments shorter than two seasons are dropped (no init basis);
    count them upstream if that needs surfacing. All arithmetic is
    IEEE double in a pinned evaluation order, so any engine replaying
    the recipe (the DuckDB recursive-CTE oracle does) reproduces every
    bit. Returns (``*segment_cols``, ds, yhat) forecast rows only.
    """
    segs = [str(c) for c in segment_cols]
    m = int(season)
    norm = df.select(
        *segs,
        F.col(date_col).cast("date").alias("__ds"),
        F.col(value_col).cast("double").alias("__y"),
    )
    series = (
        norm.groupBy(*segs)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__ds"), F.col("__y")))
            ).alias("pts")
        )
        .withColumn("ys", F.expr("transform(pts, p -> p.__y)"))
        .withColumn("last_ds", F.expr("element_at(pts, -1).__ds"))
        .filter(F.size("ys") >= 2 * m)
    )
    # init means as explicit left folds (DuckDB's list_reduce matches
    # aggregate's (((0+y1)+y2)+...) order bit-for-bit)
    fold_sum = "aggregate(slice(ys, {start}, {m}), cast(0 as double), (a, x) -> a + x)"
    l0 = f"({fold_sum.format(start=1, m=m)} / {m})"
    b0 = f"(({fold_sum.format(start=m + 1, m=m)} / {m} - {l0}) / {m})"
    s0 = f"transform(slice(ys, 1, {m}), x -> x - {l0})"
    upd = _hw_update_sql(alpha, beta, gamma, m)
    state = (
        f"aggregate(ys, named_struct('l', {l0}, 'b', {b0}, 's', {s0}), "
        f"(acc, y) -> named_struct('l', {upd['l']}, 'b', {upd['b']}, "
        f"'s', {upd['s']}))"
    )
    fc = (
        f"transform(sequence(1, {int(horizon_days)}), h -> named_struct("
        f"'ds', date_add(last_ds, h), "
        f"'yhat', __hw.l + h * __hw.b + element_at(__hw.s, ((h - 1) % {m}) + 1)))"
    )
    return (
        series.withColumn("__hw", F.expr(state))
        .select(*segs, F.explode(F.expr(fc)).alias("__f"))
        .select(*segs, F.col("__f.ds").alias("ds"), F.col("__f.yhat").alias("yhat"))
    )


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
