"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    For CPU-bound per-row kernels (multi-perm hashing, bit-vote
    folds, shingling, plane projections): input that arrives as one
    small file would run the whole kernel on one core. One row-level
    shuffle is ~one extra pass — noise next to the kernel — and buys
    full-cluster parallelism. At 100 TB the input is already
    thousands of partitions, and pipelines that pre-partition can
    skip this by repartitioning upstream (Spark elides the exchange
    when the child partitioning already satisfies it).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)
