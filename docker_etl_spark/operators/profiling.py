"""One-pass per-column data profiling.

The data-quality probe every ETL job in the reference hand-rolls as
ad-hoc validation queries (webcompat-kb's row-count/schema checks,
bqetl-style sanity SQL): null rate, distinct cardinality, min/max per
column, computed in a single aggregate over one table scan and
unpivoted to one row per column.

Scale: one scan, one aggregate. Exact per-column COUNT(DISTINCT)
makes Catalyst plan an Expand (one duplicated stream per distinct
column) — correct but multiplies shuffle volume by the column count,
so at 100 TB callers pass ``exact=False`` to use HLL sketches
(approx_count_distinct) which keep the aggregate single-stream and
partial-aggregatable. The oracle-compared query path uses exact
counts; the default follows the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """Profile ``cols`` → one row per column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    min/max are cast to string AFTER the typed aggregation so numeric
    and temporal columns order natively (string-casting first would
    rank "9" over "10").
    """
    aggs: list = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"__nulls_{c}")
        )
        if exact:
            aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}")
            )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args: list[str] = []
    for c in cols:
        stack_args.append(f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}")
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, "
            + ", ".join(stack_args)
            + ") as (column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def histogram_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bucket_width: int,
    n_buckets: int = 10,
) -> DataFrame:
    """Distribution drift between two corpus slices/snapshots — the
    data-quality probe a continuous pipeline runs before admitting a
    new batch (did the length/score distribution shift?).

    Values histogram into ``n_buckets`` fixed-width buckets (last
    bucket open-ended); each bucket row carries both sides' counts
    and the two-sample chi-square term

        drift_term = (n_a*N_b - n_b*N_a)^2 / (N_a*N_b*(n_a+n_b))

    — computed in double end-to-end (counts are exact in a double up
    to 2^53; each arithmetic step is ONE IEEE op in a fixed order),
    so the value is bit-identical across engines at any corpus size —
    integer products would overflow 64-bit at ~1e10-row slices. The
    chi-square statistic is the sum of the terms (left to the
    consumer, where summation order is theirs).

    One union + one groupBy on the bucket key; totals come from a
    global window over the (n_buckets)-row aggregate, not the input.
    """
    def bucketed(df: DataFrame, side: int) -> DataFrame:
        b = F.least(
            F.floor(F.col(value_col) / bucket_width),
            F.lit(n_buckets - 1),
        ).cast("long")
        return df.select(b.alias("bucket"), F.lit(side).alias("__side"))

    u = bucketed(df_a, 0).unionByName(bucketed(df_b, 1))
    g = u.groupBy("bucket").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    w = Window.partitionBy()
    na = F.sum("n_a").over(w).cast("double")
    nb = F.sum("n_b").over(w).cast("double")
    num = (
        F.col("n_a").cast("double") * nb - F.col("n_b").cast("double") * na
    )
    term = (num * num) / (
        na * nb * (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return g.select(
        "bucket", "n_a", "n_b", term.alias("drift_term")
    )
