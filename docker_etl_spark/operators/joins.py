"""Join operators (SURVEY.md §2.3 J1-J15).

Plain equi-joins (J1-J3) need no operator wrapper — ``df.join`` with
Catalyst's broadcast/SMJ selection is already the right physical
plan. This module implements the join *patterns* the reference
hand-builds: the date-spine range join (J6+F7), semi/anti joins
(J8/J9), and the stratified-sampling join (J10).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docker_etl_spark.functions.scalars import deterministic_order_key


def date_spine(
    spark: SparkSession,
    start: str | dt.date,
    stop: str | dt.date,
    step_days: int | None = None,
    step_months: int | None = None,
    col_name: str = "spine_date",
) -> DataFrame:
    """Generated date-array row source (F7).

    Reference: GENERATE_DATE_ARRAY + UNNEST
    (webcompat_topline_metric/view.sql:23;
    webcompat_bugs_diagnosis_survival/query.sql:51).

    Built with ``sequence()`` + explode — a single literal-folded
    expression, so the spine is computed once at plan time, not via a
    driver loop.
    """
    if step_months is not None:
        interval = F.expr(f"interval {step_months} month")
    else:
        interval = F.expr(f"interval {step_days or 1} day")
    seq = F.sequence(
        F.lit(str(start)).cast("date"), F.lit(str(stop)).cast("date"), interval
    )
    return spark.range(1).select(F.explode(seq).alias(col_name))


def range_join_active_at(
    spine: DataFrame,
    entities: DataFrame,
    spine_col: str,
    start_col: str,
    end_col: str,
    how: str = "left",
    end_open: bool = False,
) -> DataFrame:
    """Temporal-validity range join (J6): spine date × entities active
    at that date (start <= d AND (d <= end OR end IS NULL)).

    Reference: webcompat_topline_metric/view.sql:21-31 (week dates ×
    bugs open at each date).

    Physical note: a non-equi join — Catalyst executes it as
    broadcast-nested-loop when one side is small (the spine always
    is: broadcast it). At 100 TB the entities side streams past the
    broadcast spine exactly once; no shuffle. If both sides were
    large, bucket both by month and add the month equi-key.
    """
    d = spine[spine_col]
    upper = d < entities[end_col] if end_open else d <= entities[end_col]
    cond = (entities[start_col] <= d) & (upper | entities[end_col].isNull())
    return F.broadcast(spine).join(entities, cond, how)


def range_join_active_at_bucketed(
    spine: DataFrame,
    entities: DataFrame,
    spine_col: str,
    start_col: str,
    end_col: str,
    clamp_end: str | dt.date,
    how: str = "left",
    end_open: bool = False,
) -> DataFrame:
    """J6 as a pure equi join: month-bucket the validity window.

    The scale path for when BOTH sides are large (SURVEY.md §7 risk
    register): each entity explodes into one row per month its
    [start, end] interval covers (NULL/unbounded ends clamp to
    ``clamp_end``, normally the spine's last date); the spine keys on
    its own month. The join is then month-bucket equality plus the
    residual range predicate — a shuffle hash/sort-merge join that
    partitions on the bucket, never a nested loop. Cost model: row
    explosion = avg months spanned per entity, traded against
    all-pairs-per-partition; right for wide spines × big entity
    tables. For a small spine, ``range_join_active_at``'s broadcast
    nested loop is cheaper — pick per shape.

    Results are identical to ``range_join_active_at`` for intervals
    ending on/before ``clamp_end``.
    """
    d = spine[spine_col]
    bucket_seq = F.sequence(
        F.date_trunc("month", F.col(start_col)).cast("date"),
        F.date_trunc(
            "month",
            F.least(
                F.coalesce(F.col(end_col), F.lit(str(clamp_end)).cast("date")),
                F.lit(str(clamp_end)).cast("date"),
            ),
        ).cast("date"),
        F.expr("interval 1 month"),
    )
    # Entities starting after clamp_end can never match a spine date
    # <= clamp_end; dropping them keeps the bucket sequence ascending
    # (sequence() errors on start > stop).
    bounded = entities.filter(
        F.col(start_col) <= F.lit(str(clamp_end)).cast("date")
    )
    exploded = bounded.withColumn("__bucket", F.explode(bucket_seq))
    upper = d < exploded[end_col] if end_open else d <= exploded[end_col]
    cond = (
        (F.date_trunc("month", d).cast("date") == exploded["__bucket"])
        & (exploded[start_col] <= d)
        & (upper | exploded[end_col].isNull())
    )
    return spine.join(exploded, cond, how).drop("__bucket")


def semi_join(df: DataFrame, other: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """EXISTS semi-join (J8). Reference: site_reports/view.sql:26-27."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """NOT IN / set-difference anti-join (J9/U4).

    Reference: client_regeneration/main.py:133-141 (churn-pool
    removal); bqhelpers.py:469-516 (schema diffing).
    """
    return df.join(other, on, "left_anti")


def stratified_sampling_join(
    pool: DataFrame,
    demand: DataFrame,
    stratum_col: str,
    pool_id_cols: Sequence[str],
    demand_id_cols: Sequence[str],
    seed: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Rank-aligned stratified-sampling join (J10).

    Pairs each ``demand`` row with a distinct ``pool`` row in the same
    stratum, in deterministic pseudo-random order: both sides get
    ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY hash(id, seed))
    and join on (stratum, rn).

    Reference: client_regeneration/main.py:61-117 — replacement
    clients matched to churned clients per sample bucket with a
    seeded FARM_FINGERPRINT order (here xxhash64; ordering semantics
    preserved, hash values differ — see deterministic_order_key).

    ``hash_fn='md5'`` orders by an md5 hex digest instead — slower,
    but engine-portable (identical ordering in any SQL engine), which
    is what the differential-test queries use.
    """
    def order_key(id_cols: Sequence[str]) -> Column:
        if hash_fn == "md5":
            parts = [F.col(c).cast("string") for c in id_cols] + [F.lit(seed)]
            return F.md5(F.concat(*parts))
        return deterministic_order_key(*id_cols, seed=seed)

    def ranked(df: DataFrame, id_cols: Sequence[str]) -> DataFrame:
        w = Window.partitionBy(stratum_col).orderBy(order_key(id_cols), *id_cols)
        return df.withColumn("__rn", F.row_number().over(w))

    p = ranked(pool, pool_id_cols)
    c = ranked(demand, demand_id_cols)
    return p.join(c, [stratum_col, "__rn"], "inner").drop("__rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Point-in-time (as-of) left join: for each left row, attach the
    single right row with the greatest ``right_ts`` <= ``left_ts``
    (< when ``strict``) within the ``on`` key — the standard
    snapshot/attribution lookup that SQL engines expose as ASOF JOIN.

    Spark-first plan: instead of a non-equi range join (which Catalyst
    would run as a nested loop), both sides are tagged and UNIONed,
    then one window pass per key carries the most recent right
    payload forward onto each left row — a single shuffle on ``on``
    plus a sort, the same cost as any windowed aggregate, at any
    scale. No driver-side loops, no broadcast requirement on either
    side.

    Within a key, right rows must be unique per ``right_ts`` instant
    (dedupe first) — otherwise which same-instant payload wins is
    plan-order-dependent. Ties between left and right at the same
    instant: inclusive mode matches them (right sorts before left),
    strict mode does not (right sorts after left).

    Output: all left columns plus ``right_cols`` (null when no as-of
    match exists). ``left``/``right`` may share column names — right
    payload is carried in a struct and re-emitted, so only the ``on``
    keys must align."""
    on = list(on)
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__p")
    # right rows sort before left rows at an equal instant (side 0)
    # in inclusive mode, after them (side 2) in strict mode.
    r_side = 2 if strict else 0
    r = right.select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.lit(r_side).alias("__side"),
        payload,
    )
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l_ = left.select(
        *on,
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(payload).schema["__p"].dataType.simpleString()
        ).alias("__p"),
        lrow,
    )
    r = r.withColumn("__l", F.lit(None).cast(l_.schema["__l"].dataType.simpleString()))
    unioned = r.unionByName(l_)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ats").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
    return out


def fuzzy_entity_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 2,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Entity-resolution self-match: pairs whose names are within
    ``max_distance`` Levenshtein edits — the classic data-cleaning
    join (near-identical vendor/customer records from typos and
    formatting drift; the reference's schema-sync jobs assume
    upstream already did this — here it is an engine operator).

    Candidate generation is a LOSSLESS length band: edit distance is
    bounded below by the length difference, so bucketing lengths at
    width ``max_distance + 1`` and emitting the right side into
    bucket ± 1 (the x04/ngram_jaccard recipe) covers every
    |Δlen| ≤ max_distance pair with a pure EQUI join — no recall
    loss, unlike phonetic blocking. ``block_cols`` add exact-match
    blocking attributes (region, type, …) that bound the per-bucket
    population; at 100 TB a name-only band over a giant entity table
    is the quadratic trap, an attribute block is what caps it.
    Verification is JVM ``levenshtein`` (integer, identical in any
    engine).

    Output: (id_a, id_b, name_a, name_b, distance), id_a < id_b.
    """
    width = max_distance + 1
    blocks = list(block_cols)
    a = df.select(
        *blocks,
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        (F.length(name_col).cast("long") / width)
        .cast("long")
        .alias("__band"),
    )
    bb = df.select(
        *blocks,
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.explode(
            F.array(
                *[
                    (
                        (F.length(name_col).cast("long") / width).cast("long")
                        + d
                    )
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("__band"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(bb, [*blocks, "__band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", dist.alias("distance"))
        .dropDuplicates(["id_a", "id_b"])
    )
