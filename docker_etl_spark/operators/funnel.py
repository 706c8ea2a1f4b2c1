"""Staged funnel classification (SURVEY.md §2.4 A11/A12).

The reference's update-orphaning job classifies each client through a
short-circuit funnel — a sequence of (stage, predicate) checks where
the first match wins — then counts per stage
(update_orphaning_dashboard/processing.py:154-307, itself a port of a
legacy Spark RDD countByKey job, processing.py:10-13).

Spark-first: the funnel is ONE when-chain Column (first-match-wins is
exactly CASE WHEN semantics), so the whole classification runs in
whole-stage codegen and the counts are a single hash aggregate — no
per-row Python, no countByKey.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_classify(
    df: DataFrame,
    stages: Sequence[tuple[str, Column]],
    out_col: str = "stage",
    default: str = "other",
) -> DataFrame:
    """Add a first-match-wins stage label column."""
    expr: Column | None = None
    for name, cond in stages:
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    if expr is None:
        raise ValueError("at least one stage required")
    return df.withColumn(out_col, expr.otherwise(F.lit(default)))


def funnel_counts(
    df: DataFrame,
    stages: Sequence[tuple[str, Column]],
    group_by: Sequence[str] = (),
    out_col: str = "stage",
    default: str = "other",
) -> DataFrame:
    """Classify + count per stage (optionally per extra group keys) —
    the reference's per-stage Counter, as one aggregate."""
    classified = funnel_classify(df, stages, out_col=out_col, default=default)
    return classified.groupBy(*group_by, out_col).agg(F.count("*").alias("n"))
