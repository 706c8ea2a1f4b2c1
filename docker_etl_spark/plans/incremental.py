"""Incremental-computation orchestration: watermarks, idempotency
guards, partition replace (SURVEY.md §2.4 A13, §2.10 D3/D5, §4).

The reference's incremental idioms:
- watermark-bounded append: aggregate only days in
  (last_stored, today - margin] — etl/user_reports_aggregate.py:17-53.
- "already ran today" idempotency guard — etl/metric.py:30-39.
- idempotent partition replace (delete+insert by yyyymm) —
  etl/siterank.py:114-135 → dynamic partition overwrite here.

The watermark itself is data, not engine state: read MAX(cursor) from
the target (exactly how the reference derives @latest_stored) so
reruns are naturally idempotent.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


@dataclass
class WatermarkStore:
    """Watermark = MAX(cursor_col) of the target table (parquet path).

    Deriving from the target (not a side store) makes append + rerun
    idempotent: a partially-failed run re-reads the true high-water
    mark next time.
    """

    spark: SparkSession
    target_path: str
    cursor_col: str

    def read(self):
        try:
            df = self.spark.read.parquet(self.target_path)
        except AnalysisException as ex:
            # Only "target doesn't exist yet" means no watermark; any
            # other failure (corruption, permissions, transient IO) must
            # propagate — returning None there would silently re-append
            # the whole source.
            missing = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
            condition = None
            for getter in ("getCondition", "getErrorClass"):
                fn = getattr(ex, getter, None)
                if callable(fn):
                    try:
                        condition = fn()
                    except Exception:
                        condition = None
                    if condition:
                        break
            if condition in missing or (
                condition is None
                and (
                    any(c in str(ex) for c in missing)
                    or "Path does not exist" in str(ex)
                )
            ):
                return None
            raise
        row = df.agg(F.max(self.cursor_col).alias("wm")).first()
        return row.wm if row else None


def incremental_append(
    source: DataFrame,
    store: WatermarkStore,
    lateness_margin_days: int = 2,
    today: dt.date | None = None,
    cursor: Column | None = None,
) -> tuple[DataFrame, object, dt.date]:
    """Bound a source to (watermark, today - margin] (A13/T8/D5).

    Returns (bounded_df, watermark, store_to). The caller writes
    ``bounded_df`` with mode('append') — combined with the
    target-derived watermark this is the reference's
    @latest_stored/@store_to contract (user_reports_aggregate.py:17-53).
    An empty bound (watermark already at store_to) is the reference's
    'already ran today' guard (etl/metric.py:30-39): nothing to write.
    """
    c = cursor if cursor is not None else F.col(store.cursor_col)
    today = today or dt.date.today()
    store_to = today - dt.timedelta(days=lateness_margin_days)
    wm = store.read()
    bounded = source.filter(c <= F.lit(store_to))
    if wm is not None:
        bounded = bounded.filter(c > F.lit(wm))
    return bounded, wm, store_to


def partition_replace(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Idempotent partition replace (D3): dynamic partition overwrite
    rewrites exactly the partitions present in ``df`` — the engine
    form of the reference's DELETE WHERE yyyymm + INSERT
    (etl/siterank.py:114-135). Requires the session default
    partitionOverwriteMode=dynamic (set by session.get_spark)."""
    # hash-distribute on the partition column first (the
    # write_digest_store discipline): one file per replaced partition
    # instead of tasks × partitions commit operations; explicit count
    # so AQE cannot serialize the directory commits into one task
    from docker_etl_spark.sources.stores import write_repartition

    write_repartition(df, (partition_col,)).write.mode(
        "overwrite"
    ).partitionBy(partition_col).parquet(path)
