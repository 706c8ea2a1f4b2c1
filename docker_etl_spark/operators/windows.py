"""Window-function operators (SURVEY.md §2.5 W4-W6).

Each builds a single Window spec per partition key set so Spark plans
one shuffle + one sort for all derived columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docker_etl_spark.functions.scalars import safe_divide


def lag_features(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    value_col: str,
    lags: Sequence[int] = (1, 2, 7, 14, 21, 28),
    with_ratios: bool = True,
) -> DataFrame:
    """Lag/shift features + day-over-day / week-over-week ratios (W4).

    Reference: search-alert's pandas shift features
    (search_alert/main.py:195-231 — lag_1/2/7/14/21/28, ``dod``,
    ``wow``, ``dod_in_wow``). One window spec; all lags share the
    single sort.
    """
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    out = df
    for n in lags:
        out = out.withColumn(f"lag_{n}", F.lag(value_col, n).over(w))
    if with_ratios and 1 in lags and 7 in lags:
        out = out.withColumn("dod", safe_divide(F.col(value_col), F.col("lag_1")))
        out = out.withColumn("wow", safe_divide(F.col(value_col), F.col("lag_7")))
        out = out.withColumn("dod_in_wow", safe_divide(F.col("dod"), F.col("wow")))
    return out


def share_of_total(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    out_col: str = "pcnt_value",
) -> DataFrame:
    """Group share of total (W5): value / SUM(value) OVER (PARTITION BY …).

    Reference: search_alert/main.py:212 (pandas transform(sum) ratio).
    """
    w = Window.partitionBy(*partition_by)
    return df.withColumn(out_col, safe_divide(F.col(value_col), F.sum(value_col).over(w)))


def moving_average(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    value_col: str,
    window_rows: int,
    out_col: str = "moving_avg",
) -> DataFrame:
    """Trailing moving average over the last ``window_rows`` rows (W6).

    Reference: search-term-data-validation mean_check
    (data_validation.py:238-320, moving_average_window days).
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out_col, F.avg(value_col).over(w))
