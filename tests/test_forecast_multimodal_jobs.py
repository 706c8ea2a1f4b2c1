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
    twin = d.withColumn("p2", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    joined = scored.join(twin.select("doc_id", "p2"), "doc_id")
    bad = joined.filter(F.abs(F.col("p") - F.col("p2")) > 1e-9).count()
    assert bad == 0
