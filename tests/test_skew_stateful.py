"""Skew-mitigation operators and the applyInPandasWithState
sessionizer (custom stateful streaming)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from docker_etl_spark.operators.skew import (
    salted_join_hot_keys,
    salted_sum,
    upsert_by_key,
)
from docker_etl_spark.sources.io import load_table


def test_salted_sum_matches_plain_sum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("value").cast("decimal(12,2)").alias("v")
    )
    plain = {
        r["user_id"]: r["s"]
        for r in ev.groupBy("user_id").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["user_id"]: r["v"]
        for r in salted_sum(
            ev, ["user_id"], ["v"], salt_buckets=8, salt_on=["event_id"]
        ).collect()
    }
    assert salted == plain


def test_salted_join_hot_keys_matches_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    hot = spark.createDataFrame([("click",), ("view",)], "event_type string")
    plain = sorted(
        tuple(r) for r in ev.join(dim, "event_type").select("event_id", "weight").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join_hot_keys(ev, dim, "event_type", hot, salt_buckets=4)
        .select("event_id", "weight")
        .collect()
    )
    assert salted == plain


def test_upsert_by_key(spark):
    cur = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )
    upd = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k int, name string, v int"
    )
    out = sorted(tuple(r) for r in upsert_by_key(cur, upd, ["k"]).collect())
    assert out == [(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)]


def test_sessionize_with_state_closes_sessions(spark, tmp_path):
    """Two sessions for u1 (gap > 30 min between event groups), one
    for u2; a late max-watermark event forces closure of all state."""
    from docker_etl_spark.streaming.core import sessionize_with_state

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        ("u1", "2026-01-01 10:00:00"),
        ("u1", "2026-01-01 10:10:00"),
        ("u1", "2026-01-01 12:00:00"),  # new session (gap 110 min)
        ("u2", "2026-01-01 10:05:00"),
        # far-future row pushes the watermark past every timeout
        ("u9", "2026-01-02 00:00:00"),
    ]
    import csv

    with open(src / "events.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)

    events = (
        spark.readStream.schema("user STRING, ts_raw STRING")
        .csv(str(src))
        .select("user", F.col("ts_raw").cast("timestamp").alias("ts"))
    )
    sessions = sessionize_with_state(
        events, ["user"], time_col="ts", gap="30 minutes", watermark="0 seconds"
    )
    out = str(tmp_path / "out")

    def run_pass() -> None:
        q = (
            sessions.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_pass()
    # A second pass with a later event lets event-time timeouts fire
    # for state whose timeout fell below the final watermark.
    with open(src / "nudge.csv", "w", newline="") as f:
        csv.writer(f).writerows([("u9", "2026-01-03 00:00:00")])
    run_pass()
    time.sleep(1)
    got = {
        (r["user"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("u1", "2026-01-01 10:00:00", "2026-01-01 10:10:00", 2) in got
    assert ("u2", "2026-01-01 10:05:00", "2026-01-01 10:05:00", 1) in got
    # the second u1 session closes once the watermark passes its timeout
    assert ("u1", "2026-01-01 12:00:00", "2026-01-01 12:00:00", 1) in got
