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

from pyspark.sql import DataFrame
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
