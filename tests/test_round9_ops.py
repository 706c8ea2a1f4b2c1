"""Round-9 operator tests: ADVICE hardening (seasonal pmod, ftyp
size sanity, search-index meta sidecar, cross-batch id contracts),
BM25 store compaction, batch-query retrieval, and the retrieval-
quality eval."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------


def test_seasonal_mad_pmod_keeps_weekday_whole_across_origin(spark):
    """Rows dated BEFORE season_origin must land in the SAME season
    bucket as the same weekday after it (r8 ADVICE: `%` takes the
    dividend's sign, splitting each weekday class in two)."""
    import datetime as dt

    from docker_etl_spark.operators.profiling import seasonal_mad_outliers

    origin = dt.date(1995, 1, 2)  # the operator default origin is 1995-01-01
    rows = []
    # 4 weeks BEFORE the origin and 4 weeks after: same rhythm.
    for i in range(-28, 28):
        day = origin + dt.timedelta(days=i)
        val = 1000 if i % 7 == 0 else 100  # Mondays spike by design
        rows.append((day, val))
    df = spark.createDataFrame(rows, "day date, n int")
    out = {r["day"]: r for r in seasonal_mad_outliers(df, "day", "n").collect()}
    # every season key is in [0, 7) even for pre-origin dates
    assert all(0 <= r["season"] < 7 for r in out.values())
    # pre-origin Monday and post-origin Monday share one bucket ->
    # both get the Monday median, and nothing flags (pure rhythm)
    pre_monday = origin + dt.timedelta(days=-7)
    assert out[pre_monday]["season"] == out[origin]["season"]
    assert out[pre_monday]["season_median"] == 1000
    assert not any(r["outlier"] for r in out.values())


def test_detect_media_format_rejects_textual_ftyp(spark):
    """'xxxxftyp...' (arbitrary text whose bytes 5-8 spell ftyp) must
    NOT be labeled mp4 — a real ftyp leads with a plausible big-endian
    box size in [16, len(payload)] (r8 ADVICE)."""
    from docker_etl_spark.operators.multimodal import detect_media_format

    good = (24).to_bytes(4, "big") + b"ftypisom" + b"\x00\x00\x02\x00isomiso2"
    rows = [
        (1, good),
        (2, b"xxxxftyp arbitrary text payload"),  # size = 0x78787878 > len
        (3, (8).to_bytes(4, "big") + b"ftypisom"),  # size 8 < 16: no brand
        (4, (64).to_bytes(4, "big") + b"ftypisom"),  # size 64 > payload len
    ]
    df = spark.createDataFrame(rows, "id int, content binary")
    out = {
        r["id"]: r["fmt"]
        for r in df.select("id", detect_media_format("content").alias("fmt")).collect()
    }
    assert out == {1: "mp4", 2: "unknown", 3: "unknown", 4: "unknown"}
