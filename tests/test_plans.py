"""Catalog ref() DAG, incremental watermark append, partition
replace, event replay, IO write modes — the framework layer."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from docker_etl_spark.plans import Project, WatermarkStore, incremental_append
from docker_etl_spark.plans.incremental import partition_replace
from docker_etl_spark.operators.replay import replay_states
from docker_etl_spark.sources.io import load_table, write_table


def test_catalog_ref_dag_deploys_in_order(spark, sf_dir):
    p = Project(
        spark,
        base_tables={"orders_base": load_table(spark, sf_dir, "orders")},
        prefix="t_",
    )
    # deliberately registered out of dependency order
    p.add_view(
        "big_orders_by_status",
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{ ref('big_orders') }} GROUP BY 1",
    )
    p.add_view(
        "big_orders",
        "SELECT * FROM {{ ref('orders_base') }} WHERE o_totalprice > 100000",
    )
    deployed = p.deploy()
    assert deployed.index("big_orders") < deployed.index("big_orders_by_status")
    out = p.table("big_orders_by_status").collect()
    direct = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert {(r.o_orderstatus, r.n) for r in out} == {
        (r.o_orderstatus, r["count"]) for r in direct
    }


def test_catalog_unknown_ref_raises(spark):
    p = Project(spark)
    p.add_view("v", "SELECT * FROM {{ ref('nope') }}")
    with pytest.raises(KeyError, match="nope"):
        p.deploy()


def test_incremental_append_watermark_cycle(spark, tmp_path):
    target = str(tmp_path / "agg")
    rows = [(dt.date(2024, 1, d), float(d)) for d in range(1, 11)]
    src = spark.createDataFrame(rows, "day date, v double")
    store = WatermarkStore(spark, target, "day")

    bounded, wm, _ = incremental_append(
        src, store, lateness_margin_days=2, today=dt.date(2024, 1, 8)
    )
    assert wm is None
    bounded.write.mode("append").parquet(target)
    assert spark.read.parquet(target).count() == 6  # days 1..6

    # next run two days later: only the newly unlocked days append
    bounded2, wm2, _ = incremental_append(
        src, store, lateness_margin_days=2, today=dt.date(2024, 1, 10)
    )
    assert wm2 == dt.date(2024, 1, 6)
    bounded2.write.mode("append").parquet(target)
    got = sorted(r.day for r in spark.read.parquet(target).collect())
    assert got == [dt.date(2024, 1, d) for d in range(1, 9)]

    # rerun same day: empty bound (idempotency guard)
    bounded3, _, _ = incremental_append(
        src, store, lateness_margin_days=2, today=dt.date(2024, 1, 10)
    )
    assert bounded3.count() == 0


def test_partition_replace_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "part")
    v1 = spark.createDataFrame(
        [("2024-01", 1), ("2024-02", 2)], "ym string, v int"
    )
    partition_replace(v1, path, "ym")
    # replace only 2024-02 with new content; 2024-01 must survive
    v2 = spark.createDataFrame([("2024-02", 99)], "ym string, v int")
    partition_replace(v2, path, "ym")
    got = {(r.ym, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01", 1), ("2024-02", 99)}


def test_write_table_dry_run_writes_nothing(spark, tmp_path):
    df = spark.range(5)
    path = str(tmp_path / "dry")
    write_table(df, path, write=False)
    with pytest.raises(Exception):
        spark.read.parquet(path).count()


def test_event_replay_reverse_diffs(spark):
    """Reference semantics (metric_changes.py:186-314): walking history
    newest-first, state[field] := removed reconstructs prior states."""
    current = spark.createDataFrame(
        [(1, {"status": "RESOLVED", "priority": "P1"})],
        "number int, state map<string,string>",
    )
    t = lambda s: dt.datetime.fromisoformat(s)
    history = spark.createDataFrame(
        [
            (1, t("2024-03-01T00:00:00"), [{"field_name": "status", "added": "RESOLVED", "removed": "ASSIGNED"}]),
            (1, t("2024-02-01T00:00:00"), [{"field_name": "priority", "added": "P1", "removed": "P3"}]),
            (1, t("2024-01-01T00:00:00"), [{"field_name": "status", "added": "ASSIGNED", "removed": "NEW"}]),
        ],
        "number int, change_time timestamp_ntz, changes array<struct<field_name string, added string, removed string>>",
    )
    out = {r.change_time: r.state_before for r in replay_states(current, history).collect()}
    # before the Mar 1 change: status was ASSIGNED
    assert out[t("2024-03-01T00:00:00")] == {"status": "ASSIGNED", "priority": "P1"}
    # before Feb 1: priority was P3 too
    assert out[t("2024-02-01T00:00:00")] == {"status": "ASSIGNED", "priority": "P3"}
    # before Jan 1: the original state
    assert out[t("2024-01-01T00:00:00")] == {"status": "NEW", "priority": "P3"}
