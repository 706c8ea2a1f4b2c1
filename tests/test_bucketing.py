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
