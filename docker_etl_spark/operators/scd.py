"""Slowly-changing-dimension (type 2) build from a change stream.

The warehouse-maintenance primitive behind the reference's
snapshot-history pattern (webcompat-kb's daily `history` inserts,
jobs/webcompat-kb/webcompat_kb/etl/history.py): instead of storing one
snapshot row per day, collapse an ordered change stream into validity
intervals — one row per (key, attribute-state run) with
``valid_from`` / ``valid_to`` / ``is_current``.

Spark-first design: change detection is one lag() window, interval
close is one lead() window over the survivors — two sorts over a
single shuffle on the entity key, no self-join, no collect. At 100 TB
the cost is the one hash partition by key; runs are collapsed
map-side-after-shuffle with bounded per-row state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
    valid_from_col: str,
) -> DataFrame:
    """Collapse an ordered per-key change stream into SCD2 intervals.

    ``order_cols`` must be a deterministic total order within a key
    (include a unique tiebreak — queries.py determinism rules).
    A row opens a new interval iff any ``attr_cols`` value differs
    from the previous row's (NULL-safe comparison). The interval's
    ``valid_to`` is the next interval's ``valid_from`` (NULL for the
    current one); ``is_current`` flags the open interval.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    opens = (
        df.withColumn("__first", F.row_number().over(w) == 1)
        .withColumn("__changed", changed)
        .filter(F.col("__first") | F.col("__changed"))
        .drop("__first", "__changed")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        opens.withColumn(
            "valid_from", F.col(valid_from_col)
        )
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, *attr_cols, "valid_from", "valid_to", "is_current"
        )
    )
