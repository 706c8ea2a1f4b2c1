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


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Batch gap-based sessionization: consecutive events of a key
    belong to one session while the gap between neighbors stays
    <= ``gap_seconds``; a larger gap opens a new session. The batch
    twin of ``streaming/core.sessionize_with_state`` (same semantics,
    one window pass instead of per-batch state).

    Classic two-window recipe — lag to flag session starts, running
    sum of flags to number sessions — so the whole thing is ONE
    shuffle on the key columns; both windows and the final groupBy
    share that partitioning (Catalyst reuses the exchange).

    Timestamps are truncated to whole seconds before gap arithmetic
    (integer-exact; immune to sub-second precision differences across
    engines/storage), and ordering is (second, *order_tiebreak) so
    same-second events sessionize deterministically.

    Returns one row per session: key cols, session_start/session_end
    (second-truncated timestamps), duration_seconds, n_events.
    """
    # date_trunc silently promotes TIMESTAMP_NTZ to session-local
    # TIMESTAMP; cast back so naive event times stay naive (a
    # collect() under a non-UTC session tz would otherwise shift
    # every session boundary).
    ts_type = df.schema[ts_col].dataType
    tsec = F.date_trunc("second", F.col(ts_col)).cast(ts_type)
    order = [tsec.asc(), *[F.col(c).asc() for c in order_tiebreak]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(tsec).over(w)
    numbered = (
        df.withColumn("__tsec", tsec)
        .withColumn("__prev_ts", prev)
        .withColumn(
            "__new",
            F.when(
                F.col("__prev_ts").isNull()
                | (
                    F.expr("timestampdiff(SECOND, __prev_ts, __tsec)")
                    > gap_seconds
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_idx",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        numbered.groupBy(*key_cols, "session_idx")
        .agg(
            F.min("__tsec").alias("session_start"),
            F.max("__tsec").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .withColumn(
            "duration_seconds",
            F.expr(
                "timestampdiff(SECOND, session_start, session_end)"
            ).cast("bigint"),
        )
    )


def decayed_window_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    lookback: int = 7,
    out_col: str = "decayed_sum",
) -> DataFrame:
    """Half-life-decayed rolling sum: for each row, sum of the trailing
    ``lookback + 1`` values weighted by ``0.5 ** rows_back`` (the newest
    row gets weight 1, the row ``k`` back gets ``2**-k``).

    The exponential-decay feature a training pipeline derives from an
    activity series (recency-weighted engagement, decayed error rates)
    — same family as the reference's windowed trend features
    (jobs/search-alert/search_alert/main.py:195-231) but with
    geometric instead of flat weights.

    Determinism: weights are exact binary fractions (``2**-k``,
    ``k <= lookback``) and integer-valued inputs make every term an
    exact multiple of ``2**-lookback``, so the sum is exact and
    order-independent — bit-identical across engines for any
    accumulation order (queries.py module rules).

    Scale: one shuffle on ``partition_by`` + one sort; the weighted
    fold runs over a bounded ``collect_list`` frame (``lookback + 1``
    rows) entirely in JVM higher-order functions — no UDF, no
    second shuffle, state bounded per row.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-lookback, 0)
    )
    arr = "__decay_frame"
    terms = F.transform(
        F.col(arr),
        lambda v, i: v.cast("double")
        * F.pow(F.lit(0.5), (F.size(F.col(arr)) - 1 - i).cast("double")),
    )
    return (
        df.withColumn(arr, F.collect_list(F.col(value_col)).over(w))
        .withColumn(
            out_col, F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        )
        .drop(arr)
    )


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Per-key forward fill: each NULL value takes the most recent
    non-NULL earlier value within its key (``last(..., ignorenulls)``
    over an unbounded-preceding frame). Pair with a date-spine left
    join (operators/joins.date_spine) to densify a sparse daily
    series first — the standard gap-filling recipe for metric
    continuity.

    One shuffle on the key columns; all fills share the single
    window. Leading NULLs (no earlier observation) stay NULL.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
