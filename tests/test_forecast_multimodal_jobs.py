"""Forecast (F9), multimodal plumbing, and jobs-framework tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from docker_etl_spark.jobs import ALL_JOBS, JobContext
from docker_etl_spark.operators.forecast import (
    combine_observed_forecast,
    fit_predict_segments,
    melt_forecast_long,
)
from docker_etl_spark.operators.multimodal import (
    decode_image_features,
    media_table_from_documents,
    resize_images,
    sample_video_frames,
)
from docker_etl_spark.sources.io import load_table


def _linear_series(spark, slope=2.0, intercept=10.0, days=28, segs=("a", "b")):
    rows = []
    for s in segs:
        mult = 1 if s == "a" else 3
        for d in range(days):
            rows.append(
                (s, dt.date(2024, 1, 1) + dt.timedelta(days=d), (intercept + slope * d) * mult)
            )
    return spark.createDataFrame(rows, "segment string, ds date, y double")


def test_forecast_recovers_linear_trend(spark):
    df = _linear_series(spark)
    out = fit_predict_segments(df, ["segment"], horizon_days=7)
    rows = out.filter(F.col("is_forecast")).collect()
    assert {r.segment for r in rows} == {"a", "b"}
    assert len(rows) == 14  # 7 per segment
    # perfectly linear input (no noise): forecast continues the line
    for r in rows:
        mult = 1 if r.segment == "a" else 3
        d = (r.ds - dt.date(2024, 1, 1)).days
        expected = (10.0 + 2.0 * d) * mult
        assert abs(r.yhat - expected) < 1e-6, (r, expected)
        assert abs(r.yhat_lower - r.yhat) < 1e-6  # zero residual → zero band


def test_forecast_determinism(spark):
    df = _linear_series(spark)
    a = sorted(map(tuple, fit_predict_segments(df, ["segment"], horizon_days=5).collect()))
    b = sorted(map(tuple, fit_predict_segments(df, ["segment"], horizon_days=5).collect()))
    assert a == b


def _regime_change_series(days_flat=120, days_steep=60, slope2=3.0):
    """Flat level for ``days_flat`` days, then a steep linear ramp:
    the full-history linear fit underestimates the recent regime; a
    trailing-window fit nails it."""
    import pandas as pd

    ds = pd.date_range("2024-01-01", periods=days_flat + days_steep, freq="D")
    y = [100.0] * days_flat + [100.0 + slope2 * i for i in range(1, days_steep + 1)]
    return pd.DataFrame({"ds": ds, "y": y})


def test_rolling_origin_cv_prefers_recent_window():
    """The grid search must pick the trailing-window candidate on a
    regime-change series — the tuned model beats the fixed default on
    a true held-out tail (reference _auto_tuning contract)."""
    import numpy as np
    import pandas as pd

    from docker_etl_spark.operators.forecast import (
        _DEFAULT_PARAMS,
        _fit_curve,
        grid_search_params,
    )

    full = _regime_change_series()
    holdout_start = full["ds"].max() - pd.Timedelta(days=13)
    train = full[full["ds"] < holdout_start].reset_index(drop=True)
    test = full[full["ds"] >= holdout_start].reset_index(drop=True)

    grid = {"trend": ["linear"], "seasonality": ["none"], "window_days": [None, 45]}
    cv = {"initial_days": 90, "period_days": 14, "horizon_days": 14}
    chosen = grid_search_params(train, grid, cv)
    assert chosen["window_days"] == 45, chosen

    def holdout_mae(params):
        predict, _, _, _ = _fit_curve(train, params)
        yhat = predict(pd.DatetimeIndex(test["ds"]))
        return float(np.mean(np.abs(yhat - test["y"].to_numpy())))

    tuned = holdout_mae(chosen)
    fixed = holdout_mae({**_DEFAULT_PARAMS, "seasonality": "none"})
    assert tuned < fixed / 2, (tuned, fixed)


def test_fit_predict_segments_with_grid(spark):
    """End-to-end tuned path: per-segment grid search inside
    applyInPandas; the chosen params column records each segment's
    winner, and segments tune independently."""
    import pandas as pd

    regime = _regime_change_series()
    rows = [("shift", d.date(), v) for d, v in zip(regime["ds"], regime["y"])]
    # clean linear segment: full-history fit is already optimal
    for i in range(180):
        rows.append(("steady", dt.date(2024, 1, 1) + dt.timedelta(days=i), 50.0 + 2.0 * i))
    df = spark.createDataFrame(rows, "segment string, ds date, y double")
    out = fit_predict_segments(
        df,
        ["segment"],
        horizon_days=7,
        param_grid={"trend": ["linear"], "seasonality": ["none"], "window_days": [None, 45]},
        cv_settings={"initial_days": 90, "period_days": 14, "horizon_days": 14},
    ).cache()
    params = {
        r.segment: r.params for r in out.select("segment", "params").distinct().collect()
    }
    assert "('window_days', 45)" in params["shift"], params
    # tuned forecast for the regime-change segment tracks the steep ramp
    fc = out.filter((F.col("segment") == "shift") & F.col("is_forecast")).collect()
    last_day = max(r.ds for r in fc)
    last = [r for r in fc if r.ds == last_day][0]
    days_into_ramp = (last_day - dt.date(2024, 1, 1)).days - 119
    expected = 100.0 + 3.0 * days_into_ramp
    assert abs(last.yhat - expected) < 10.0, (last.yhat, expected)
    out.unpersist()


def test_combine_and_melt(spark):
    df = _linear_series(spark, days=10)
    fc = fit_predict_segments(df, ["segment"], horizon_days=3)
    combined = combine_observed_forecast(df, fc, ["segment"])
    srcs = {r.source for r in combined.collect()}
    assert srcs == {"observed", "forecast"}
    obs = combined.filter(F.col("source") == "observed").collect()
    assert all(abs(r.value - r.observed) < 1e-12 for r in obs)
    long = melt_forecast_long(fc, ["segment"])
    assert {r.measure for r in long.collect()} == {"yhat", "yhat_lower", "yhat_upper"}


def test_multimodal_decode_resize_framesample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = media_table_from_documents(docs)
    feats = decode_image_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r.decoder == "stub" and 0.0 <= r.mean_luma <= 255.0 for r in rows)
    # determinism of the stub kernel
    again = decode_image_features(media).collect()
    assert {(r.media_id, r.mean_luma) for r in rows} == {
        (r.media_id, r.mean_luma) for r in again
    }

    resized = resize_images(media, 64, 64).collect()
    assert all(r.meta.width == 64 and r.meta.height == 64 for r in resized)

    frames = sample_video_frames(media, every_n=50)
    frows = frames.collect()
    assert len(frows) > 20  # row-expanding
    assert all(f.frame_index % 50 == 0 for f in frows)


def test_jobs_registry_and_dry_run(spark, sf_dir, tmp_path):
    assert "monthly_revenue" in ALL_JOBS and "near_dup_report" in ALL_JOBS
    out = str(tmp_path / "rev")
    ctx = JobContext(spark, sf_dir, out, write=False)  # dry-run
    df = ALL_JOBS["monthly_revenue"]().run(ctx)
    assert df.count() > 0
    import os

    assert not os.path.exists(out)  # dry-run wrote nothing
    ctx2 = JobContext(spark, sf_dir, out, write=True)
    ALL_JOBS["monthly_revenue"]().run(ctx2)
    assert spark.read.parquet(out).count() == df.count()


def test_scaffold_job_generates_registering_module(tmp_path):
    """Reference parity: create_new_job scaffolding
    (docker_etl/create_new_job.py; tests/test_create_new_job.py).
    The generated module registers its job on import."""
    import runpy

    import pytest as _pytest

    from docker_etl_spark.jobs import ALL_JOBS, scaffold_job

    path = scaffold_job("daily_widget_report", str(tmp_path))
    assert path.endswith("daily_widget_report.py")
    runpy.run_path(path)
    assert "daily_widget_report" in ALL_JOBS
    ALL_JOBS.pop("daily_widget_report")

    with _pytest.raises(FileExistsError):
        scaffold_job("daily_widget_report", str(tmp_path))
    with _pytest.raises(ValueError):
        scaffold_job("Bad-Name", str(tmp_path))


def test_batched_inference_matches_column_twin(spark, sf_dir):
    """F8: the pandas-batched stub must equal the same formula as a
    Column expression (pins batching doesn't change semantics)."""
    from pyspark.sql import functions as F

    from docker_etl_spark.operators.inference import batched_inference
    from docker_etl_spark.sources.io import load_table

    d = load_table(spark, sf_dir, "documents")
    scored = batched_inference(d, "text", score_col="p")
    z = -3.0 + 0.002 * F.length("text") + 0.8 * (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("!"), F.lit("")))
    )
    twin = d.withColumn(
        "p2", F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
    )
    joined = scored.join(twin.select("doc_id", "p2"), "doc_id")
    # rational sigmoid: bit-exact equality, not tolerance
    bad = joined.filter(F.col("p") != F.col("p2")).count()
    assert bad == 0


def test_corpus_prep_job_curates_and_partitions_by_split(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    census = ALL_JOBS["corpus_prep"]().run(JobContext(spark, sf_dir, out, write=True))
    rows = census.collect()
    assert rows and {r["split"] for r in rows} <= {"train", "val", "test"}
    curated = spark.read.parquet(out)
    # Partitioned by split; no duplicate text survives; census matches.
    assert "split" in curated.columns
    assert curated.groupBy("text").count().filter("count > 1").count() == 0
    assert curated.count() == sum(r["n_docs"] for r in rows)
