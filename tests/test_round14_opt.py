"""Round-14 optimization invariants.

Each test pins a mechanism the second optimization round relies on:
footer-metadata counters must apply Spark's hidden-file listing rule
(crash leftovers under ``_temporary``/dot-staging never count), and
the write distribution keeps its explicit partition count under the
dynamic-allocation floor.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_parquet_row_count_skips_hidden_paths(spark, tmp_path):
    """parquet_row_count / parquet_file_count must count exactly what
    a Spark scan would read: files under ``_temporary`` (crashed-job
    task staging) or dot-prefixed staging paths are invisible to
    Spark's listing and must not inflate the footer census (x118's
    codes count, compaction sizing)."""
    from docker_etl_spark.sources.stores import (
        parquet_file_count,
        parquet_row_count,
    )

    path = str(tmp_path / "store")
    spark.range(100).write.parquet(path)
    base_rows = parquet_row_count(path)
    base_files = parquet_file_count(path)
    assert base_rows == 100
    spark_count = spark.read.parquet(path).count()
    assert base_rows == spark_count

    # plant crash leftovers: a _temporary staging tree and a dot-dir
    for hidden in ("_temporary/0/task_1", ".staging"):
        d = os.path.join(path, hidden)
        os.makedirs(d, exist_ok=True)
        spark.range(7).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "leftover")
        )
        # move the data file directly under the hidden dir too
        src = next(
            f
            for f in os.listdir(os.path.join(d, "leftover"))
            if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(d, "leftover", src), os.path.join(d, "part.parquet")
        )
    # and a dot-prefixed FILE in the live directory
    live_part = next(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    import shutil

    shutil.copy(
        os.path.join(path, live_part),
        os.path.join(path, ".tmp-copy.parquet"),
    )

    assert parquet_row_count(path) == base_rows
    assert parquet_file_count(path) == base_files
    # partition directories with "=" in the name stay visible
    part_path = str(tmp_path / "pstore")
    spark.range(10).withColumn("__pfx", F.lit("ab")).write.partitionBy(
        "__pfx"
    ).parquet(part_path)
    assert parquet_row_count(part_path) == 10


def test_write_repartition_explicit_count_with_floor(spark):
    """The pre-partitionBy distribution keeps an EXPLICIT count
    (REPARTITION_BY_NUM) equal to max(defaultParallelism,
    shuffle.partitions // 4) — locally those coincide, and the floor
    only guards cluster dynamic allocation."""
    from docker_etl_spark.sources.stores import write_repartition

    df = spark.range(100).select(
        F.md5(F.col("id").cast("string")).alias("content_md5"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 2).alias(
            "digest_prefix"
        ),
    )
    out = write_repartition(df, ("digest_prefix",))
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")) // 4,
        1,
    )
    import re

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(
        rf"RepartitionByExpression \[digest_prefix#\d+\], {n}\b", plan
    ), plan
    phys = out._jdf.queryExecution().sparkPlan().toString()
    assert "REPARTITION_BY_NUM" in phys, phys
