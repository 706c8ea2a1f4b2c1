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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key across two table snapshots: ``added``
    (only in new), ``removed`` (only in old), ``changed`` (present in
    both, any compared column differs — null-safe), ``unchanged``.
    The daily-diff primitive under change-capture reporting (the
    reference's history inserts and metric_changes both start from
    "what moved since the last snapshot").

    Returns one row per key: (*keys, change_type, changed_cols) with
    ``changed_cols`` the sorted list of differing columns (empty
    unless changed). One full-outer shuffle on the keys; compared
    values ride along, nothing is re-scanned per column.

    Scale: for partitioned snapshot layouts, diff partition-by-
    partition (prune both scans to the same partition) and union —
    the join stays co-located and a 100 TB table diffs in
    partition-sized pieces.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    changed = F.sort_array(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    empty = F.expr("cast(array() as array<string>)")
    return j.select(
        *keys,
        change_type.alias("change_type"),
        F.when(change_type == "changed", changed).otherwise(empty).alias(
            "changed_cols"
        ),
    )
