"""Skew mitigation operators (SURVEY.md §4; 100 TB notes).

AQE's skew-join splitting (on by default in ``session.get_spark``)
handles sort-merge join skew at runtime. These helpers cover the two
cases AQE does not: hot-key GROUP BY (a single giant group still
lands on one reducer) and broadcast-impossible hot-key joins. Both
use deterministic salting — `pmod(xxhash64(id), salt)` — so plans
stay reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 32,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: groupBy(keys,
    salt) partial → groupBy(keys) final.

    ``salt_on`` names the high-cardinality columns that derive the
    salt (default: all non-key columns are unavailable, so a random-
    free deterministic spread needs *some* distinguishing column —
    pass e.g. the row's natural id). With hash aggregation Spark
    already does map-side partial aggregation, which handles most
    skew; use this when a single key's partials still overwhelm one
    final-stage reducer (billions of rows per key)."""
    salt_src = list(salt_on) if salt_on else list(sum_cols)
    stage1 = (
        df.withColumn("__salt", _salt(salt_src, salt_buckets))
        .groupBy(*keys, "__salt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return stage1.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in sum_cols])


def salted_join_hot_keys(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    hot_keys: DataFrame,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where a few keys dominate ``big``: split hot keys onto
    ``salt_buckets`` shuffle partitions by salting the big side and
    EXPLODING the dim side's hot rows across all salt values.

    ``hot_keys`` is a one-column (``on``) table of the heavy hitters
    (from a stats pass or approx frequent-items). Cold keys join
    unsalted; the union is the full result. Dim-side explode is
    |hot_keys| × salt_buckets rows — trivially small by construction.

    Only ``inner``/``left`` are supported: with right/full outer, an
    unmatched exploded dim-hot row would surface once per salt bucket
    (duplicated null-extended output).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join_hot_keys supports how='inner'/'left', got {how!r}: "
            "outer joins would duplicate unmatched dim rows per salt bucket"
        )
    hot = F.broadcast(hot_keys.select(on).distinct())
    big_hot = big.join(hot, on, "left_semi")
    big_cold = big.join(hot, on, "left_anti")
    dim_hot = dim.join(hot, on, "left_semi").withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    dim_cold = dim.join(hot, on, "left_anti")

    salted_big = big_hot.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)),
    )
    hot_joined = salted_big.join(dim_hot, [on, "__salt"], how).drop("__salt")
    cold_joined = big_cold.join(dim_cold, on, how)
    return hot_joined.unionByName(cold_joined)


def upsert_by_key(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE/upsert semantics (D2: UPDATE ... FROM src; bqhelpers.py:
    651-693, client_regeneration/main.py:142-155) as copy-on-write:
    updates win on key collision, unmatched current rows pass
    through. Write the result with partition overwrite
    (plans/incremental.partition_replace) to limit the rewrite to
    touched partitions — the Delta/Iceberg-free MERGE."""
    return updates.unionByName(
        current.join(updates.select(*keys), list(keys), "left_anti")
    )


def apply_cdc(
    current: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    order_col: str | None = None,
) -> DataFrame:
    """Apply a change-data-capture batch (``op`` ∈ {'I','U','D'}) to a
    snapshot — the full MERGE triad on plain parquet tables:
    upserts win on key collision, deletes drop the key, unmatched
    current rows pass through (completes D1-D6's mutation family with
    the delete leg ``upsert_by_key`` lacks).

    With ``order_col``, multiple change rows per key are collapsed to
    the LAST one first (CDC logs replay in order; only the final
    operation matters for snapshot semantics) — without it the batch
    must already be one-row-per-key.

    Scale: one window (only if collapsing) + one left_anti on the
    touched-key set + a union — the copy-on-write recipe; pair with
    dynamic partition overwrite so only touched partitions rewrite.
    """
    keys = list(keys)
    ch = changes
    if order_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        ch = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    survivors = current.join(ch.select(*keys), keys, "left_anti")
    upserts = ch.filter(F.col(op_col) != "D").drop(op_col)
    if order_col is not None and order_col not in current.columns:
        upserts = upserts.drop(order_col)
    return survivors.unionByName(upserts)
