"""Shared operator utilities."""

from __future__ import annotations

import contextlib
import io
import math
import os
import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_SIZE_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _size_to_bytes(s: str) -> int:
    s = str(s).strip().lower().removesuffix("b")
    if s and s[-1] in _SIZE_UNITS:
        return int(float(s[:-1]) * _SIZE_UNITS[s[-1]])
    return int(float(s))


def _scan_partition_estimate(df: DataFrame) -> int | None:
    """Partitions a file-backed frame's scan will produce, estimated
    from the public file list — no job, no RDD conversion, no
    physical planning. ``inputFiles`` only does file listing; the
    split math mirrors Spark's packing: ceil(total_bytes /
    maxPartitionBytes), never below 1. When file sizes are not
    locally stat-able (object store), the file count is used as a
    lower bound — at warehouse scale that is already >= parallelism.
    """
    files = df.inputFiles()
    if not files:
        return None
    try:
        max_bytes = _size_to_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
    except Exception:
        max_bytes = 128 << 20
    total = 0
    for f in files:
        p = urlparse(f)
        path = p.path if p.scheme in ("file", "") else None
        if not (path and os.path.exists(path)):
            return len(files)  # sizes unknown: file count as lower bound
        total += os.path.getsize(path)
    return max(1, math.ceil(total / max(max_bytes, 1)))


_PLAN_PARTS = (
    re.compile(r"RoundRobinPartitioning\((\d+)"),
    re.compile(r"hashpartitioning\([^)]*?(\d+)\)"),
    re.compile(r"rangepartitioning\(.*?, (\d+)\)"),
    re.compile(r"Coalesce (\d+)"),
    re.compile(r"splits=Some\((\d+)\)"),
)


def _plan_partition_estimate(df: DataFrame) -> int | None:
    """Output-partition estimate for non-file frames, parsed from the
    physical plan text (top-down — the first partitioning marker
    belongs to the output operator). Costs one physical planning
    pass (which running the query needs anyway) but NO RDD
    conversion and no job."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    for line in buf.getvalue().splitlines():
        if "SinglePartition" in line:
            return 1
        for pat in _PLAN_PARTS:
            m = pat.search(line)
            if m:
                return int(m.group(1))
    return None


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

    The partition probe never converts to an RDD: file-backed frames
    are estimated from the file list alone (listing only — no
    planning, no job); other frames parse the physical plan text.
    Unknown stays untouched — at scale the safe default is no extra
    shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    current = _scan_partition_estimate(df)
    if current is None:
        current = _plan_partition_estimate(df)
    if current is None or current >= target:
        return df
    return df.repartition(target)
