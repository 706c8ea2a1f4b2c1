"""Bucketed tables → co-located joins (SURVEY.md §1.3: range
partitioning maps to bucketing; §4 'co-locate joins via bucketing').

The 100 TB story: two fact tables bucketed by the join key at write
time join WITHOUT a shuffle on either side — the exchange that
dominates big-big joins disappears. This test pins that plan shape
on a real saveAsTable round-trip."""

from __future__ import annotations

import contextlib
import io

import pytest

from docker_etl_spark.sources.io import load_table


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("bkt_orders", orders, "o_orderkey"),
        ("bkt_lineitem", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield "bkt_orders", "bkt_lineitem"
    for name in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    o = spark.table(o_name)
    li = spark.table(l_name)
    # Force a merge join (at fixture scale the dim auto-broadcasts,
    # which would hide the property under test: at 100 TB both sides
    # are too big to broadcast and bucketing is what kills the
    # shuffle).
    joined = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderstatus"
    ).count()
    txt = _formatted(joined)
    join_section = txt.split("SortMergeJoin")[0]
    # neither join input may re-shuffle: the only Exchange allowed in
    # the plan is the one introduced by the final groupBy
    assert "SortMergeJoin" in txt
    assert join_section.count("Exchange hashpartitioning") == 0, txt


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    bucketed = (
        spark.table(l_name)
        .join(spark.table(o_name), spark.table(l_name).l_orderkey == spark.table(o_name).o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """§1.3/P4: a date-partitioned lake layout + date predicate must
    prune at the source (PartitionFilters, not a post-scan filter)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    path = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-03")
    txt = _formatted(back)
    part_line = [l for l in txt.splitlines() if "PartitionFilters" in l]
    assert part_line and "2024-01-03" in part_line[0], txt
    # and the pruned read returns exactly that day's rows
    expected = ev.filter(F.col("day") == "2024-01-03").count()
    assert back.count() == expected > 0


def test_bucketed_range_join_is_equi_join(spark, sf_dir):
    """The month-bucketed J6 variant must (a) match the broadcast
    nested-loop variant row-for-row and (b) plan as an equi hash join
    on the bucket key — the both-sides-large scale path (SURVEY.md §7
    risk register)."""
    from pyspark.sql import functions as F

    from docker_etl_spark.operators.joins import (
        date_spine,
        range_join_active_at,
        range_join_active_at_bucketed,
    )

    spine = date_spine(spark, "1995-01-01", "2001-12-01", step_months=1)
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("start_date"))
        .withColumn("end_date", F.date_add("start_date", 89))
    )
    bnl = range_join_active_at(spine, o, "spine_date", "start_date", "end_date")
    bkt = range_join_active_at_bucketed(
        spine, o, "spine_date", "start_date", "end_date", clamp_end="2001-12-01"
    )

    def counts(df):
        return {
            (r.spine_date, r.n)
            for r in df.groupBy("spine_date").agg(F.count("o_orderkey").alias("n")).collect()
        }

    assert counts(bnl) == counts(bkt)
    plan = bkt._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan[:1200]


def test_bucketed_range_join_null_end_clamps(spark):
    """NULL (unbounded) validity ends clamp to the spine's last date
    and still match every spine month from their start."""
    from pyspark.sql import functions as F

    from docker_etl_spark.operators.joins import (
        date_spine,
        range_join_active_at_bucketed,
    )

    spine = date_spine(spark, "2024-01-01", "2024-06-01", step_months=1)
    ents = spark.createDataFrame(
        [(1, "2024-02-15", None), (2, "2024-03-01", "2024-04-02"), (3, "2024-07-01", None)],
        "id int, s string, e string",
    ).select("id", F.col("s").cast("date").alias("s"), F.col("e").cast("date").alias("e"))
    out = range_join_active_at_bucketed(
        spine, ents, "spine_date", "s", "e", clamp_end="2024-06-01", how="inner"
    )
    got = {(r.id, str(r.spine_date)) for r in out.collect()}
    assert got == {
        (1, "2024-03-01"), (1, "2024-04-01"), (1, "2024-05-01"), (1, "2024-06-01"),
        (2, "2024-03-01"), (2, "2024-04-01"),
    }


def test_write_table_bucketed_roundtrip_joins_without_shuffle(
    spark, sf_dir, tmp_path
):
    """The write_table(bucket_by=...) sink path must produce the same
    exchange-free join as the raw saveAsTable fixture."""
    from docker_etl_spark.sources.io import write_table

    orders = load_table(spark, sf_dir, "orders")
    for name in ("wt_orders_a", "wt_orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_table(
            orders,
            str(tmp_path / name),
            mode="overwrite",
            bucket_by=(4, ["o_orderkey"]),
            sort_by=["o_orderkey"],
            table_name=name,
        )
    a = spark.table("wt_orders_a")
    b = spark.table("wt_orders_b").select("o_orderkey", "o_totalprice")
    joined = a.join(b.hint("merge"), "o_orderkey")
    plan = _formatted(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == orders.count()
    for name in ("wt_orders_a", "wt_orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
