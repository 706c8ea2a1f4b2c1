"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    For CPU-bound per-row kernels (multi-perm hashing, bit-vote
    folds, shingling, plane projections): input that arrives as one
    small file would run the whole kernel on one core. One row-level
    shuffle is ~one extra pass — noise next to the kernel — and buys
    full-cluster parallelism.

    CONDITIONAL: input that is already at-or-above the session's
    default parallelism (the 100 TB case — thousands of scan
    partitions) passes through untouched. Unconditional repartition
    here would round-robin-shuffle every raw text payload before
    shingling, a full extra pass over the dataset for nothing.
    ``getNumPartitions`` on an unexecuted scan only plans the read
    (file listing/split math), it does not run the query.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
