"""Aggregation operators (SURVEY.md §2.4 A1-A15).

All of these compile to Spark HashAggregate with partial (map-side)
aggregation — the engine never collects to the driver to aggregate.
Money/score math runs in DecimalType (exact, engine-portable) and is
cast to double only at the output edge (SURVEY.md §1.2 NUMERIC
semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_counts(
    df: DataFrame,
    group_by: Sequence[str],
    conditions: dict[str, Column],
) -> DataFrame:
    """COUNTIF-per-group (A2/A3): one scan, one aggregate, N conditions.

    Reference: summary.sql:51-55 COUNTIFs; metric framework
    agg_function generation (webcompat_kb/metrics/metrics.py:151-177)
    — the dict-of-named-conditions here is that metric registry's
    Spark form.
    """
    aggs = [F.count_if(cond).alias(name) for name, cond in conditions.items()]
    return df.groupBy(*group_by).agg(*aggs)


def ordered_limited_collect(
    df: DataFrame,
    keys: Sequence[str],
    sort_cols: Sequence[str],
    value_col: Column | str,
    limit: int,
    descending: bool = True,
    ignore_nulls: bool = True,
) -> DataFrame:
    """ARRAY_AGG(x ORDER BY ... DESC LIMIT n) per key (A5/O3).

    Reference: out_of_date_details.sql:144-174 — longitudinal
    per-client ping arrays, most-recent-first, capped at 1000.

    Spark-first formulation: collect structs of (sort keys, value),
    sort_array, slice to the cap, project the value out. All four are
    JVM higher-order functions; the only shuffle is the groupBy.
    ``ignore_nulls=False`` preserves the reference's deliberately
    misaligned legacy mode (nulls kept, consuming limit slots —
    out_of_date_details.sql:133-140).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    if ignore_nulls:
        df = df.filter(v.isNotNull())
    packed = F.struct(*[F.col(c) for c in sort_cols], v.alias("__v"))
    collected = F.sort_array(F.collect_list(packed), asc=not descending)
    arr = F.transform(F.slice(collected, 1, limit), lambda s: s["__v"])
    return df.groupBy(*keys).agg(arr.alias("values"))


def group_percentiles(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    percentiles: Sequence[float],
    approximate: bool = False,
) -> DataFrame:
    """Percentiles per group (A7/A8).

    ``approximate=True`` uses percentile_approx (t-digest-style GK
    sketch — mergeable, single-pass, the 100 TB path; reference:
    APPROX_QUANTILES in webcompat_bugs_diagnosis_lifetime_percentiles/
    query.sql:43-48). ``approximate=False`` uses exact interpolated
    percentile for oracle-comparable results.
    """
    pct = F.array(*[F.lit(p) for p in percentiles])
    fn = F.percentile_approx if approximate else F.percentile
    return df.groupBy(*group_by).agg(fn(value_col, pct).alias("percentiles"))


def elementwise_vector_sum(
    df: DataFrame, group_by: Sequence[str], vec_col: str
) -> DataFrame:
    """Element-wise sum of fixed-length vectors per group (A10).

    Reference: DAP sumvec aggregation (dap_collector/main.py:96-104)
    and histogram bucket sums (graphics_dashboard.sql:386-388).

    Scale-first formulation: explode to (group, slot, value) and
    groupBy — this gets map-side partial aggregation and spills
    cleanly, unlike collect_list-then-reduce which materializes every
    vector per group. Output is re-assembled with an ordered collect
    keyed by slot index.
    """
    pos = F.posexplode(F.col(vec_col))
    exploded = df.select(*group_by, pos.alias("slot", "v"))
    slot_sums = exploded.groupBy(*group_by, "slot").agg(F.sum("v").alias("s"))
    packed = F.sort_array(F.collect_list(F.struct("slot", "s")))
    return (
        slot_sums.groupBy(*group_by)
        .agg(F.transform(packed, lambda x: x["s"]).alias("vector_sum"))
    )


def jackknife_sum_ci(
    df: DataFrame,
    group_by: Sequence[str],
    bucket_col: str,
    value_col: str,
    n_buckets: int = 20,
) -> DataFrame:
    """Jackknife (leave-one-bucket-out) confidence interval for a SUM
    (A9 / F3).

    Reference: udf_js.jackknife_sum_ci(20, ARRAY_AGG(mau)) in
    desktop-mobile-mau-2020/mobile_mau/forecast_and_actual.sql:55-80 —
    a JS UDAF over 20 id_buckets per group.

    Spark-first: pre-aggregate per (group, bucket) — a cheap partial
    agg — then a *closed-form* leave-one-out computation with plain
    Column expressions. No UDAF, no pandas: for sums, the i-th
    leave-one-out estimate is (n/(n-1))·(total − bucket_i), so mean
    and variance of the pseudo-values reduce to expressions over
    per-bucket sums. Output: struct(total, low, high) at ±1.96σ like
    the reference's UDAF.
    """
    # Exact decimal bucket sums so total/sumsq are identical across
    # engines/partition orders; only the closed-form CI math runs in
    # floating point (deterministic: all inputs exact).
    per_bucket = df.groupBy(*group_by, bucket_col).agg(
        F.sum(F.col(value_col).cast("decimal(12,2)")).alias("__bv")
    )
    n = F.lit(float(n_buckets))
    agg = per_bucket.groupBy(*group_by).agg(
        F.sum("__bv").cast("double").alias("__total"),
        F.sum(F.col("__bv") * F.col("__bv")).cast("double").alias("__sumsq"),
    )
    total = F.col("__total")
    # Pseudo-value for bucket i: t_i = n/(n-1) * (total - b_i); the
    # jackknife variance is (n-1)/n * sum_i (t_i - mean_t)^2, which for
    # sums simplifies to (n-1)/n * (n/(n-1))^2 * sum_i (b_i - total/n)^2.
    mean_b = total / n
    ss = F.col("__sumsq") - n * mean_b * mean_b
    var = (n / (n - 1)) * ss
    sd = F.sqrt(var)
    return agg.select(
        *group_by,
        F.struct(
            total.alias("total"),
            (total - F.lit(1.96) * sd).alias("low"),
            (total + F.lit(1.96) * sd).alias("high"),
        ).alias("ci"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix — the classic product-analytics
    rollup: users cohorted by first-activity week, counted in every
    subsequent week they return.

    Three bounded stages: per-user first week (one groupBy on the
    user key), user-week activity pairs (distinct on the same key —
    shares the partitioning), then a count per (cohort_week,
    weeks_since) — the output is weeks x weeks, tiny at any input
    scale. The cohort join is on the user key, hash-partitioned with
    the aggregations. Counts only, so cross-engine exact.

    Returns (cohort_week, weeks_since, n_active) with week 0 = the
    cohort's own size.
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    uw = (
        events.select(F.col(user_col).alias("u"), week.alias("w"))
        .distinct()
    )
    first = uw.groupBy("u").agg(F.min("w").alias("cohort_week"))
    return (
        uw.join(first, "u")
        .select(
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count("*").cast("long").alias("n_active"))
    )


#: Poisson(1) CDF thresholds quantized to floor(cdf * 2^32) — the
#: deterministic inverse-CDF lookup both engines share (multiplicity
#: truncated at 5; P(X >= 5) < 0.37%).
POISSON1_CDF_U32 = (
    1580030168,  # P(X <= 0)
    3160060337,  # P(X <= 1)
    3950075421,  # P(X <= 2)
    4213413783,  # P(X <= 3)
    4279248373,  # P(X <= 4)
)


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    id_col: str,
    n_replicates: int = 40,
    lo_rank: int | None = None,
    hi_rank: int | None = None,
    seed: str = "boot",
) -> DataFrame:
    """Bootstrap confidence interval for a per-group mean via the
    POISSON bootstrap (Chamandy 2012 — the resampling scheme that
    works in one distributed pass: each row's multiplicity in
    replicate b is an independent Poisson(1) draw, so no replicate
    ever needs a global sample of fixed size N). The streaming/
    map-reduce-native alternative to :func:`jackknife_sum_ci`.

    Determinism: the draw is the md5 of (id, b, seed) reduced to a
    u32 and pushed through the quantized Poisson(1) inverse CDF
    (:data:`POISSON1_CDF_U32`, multiplicity 0-5) — integer compares,
    so every engine reproduces every multiplicity. Replicate means
    are one IEEE division of exact integer sums; the CI endpoints
    are the ``lo_rank``/``hi_rank``-th smallest replicate means
    (defaults: ceil(0.025*B) and ceil(0.975*B) — rank statistics,
    no interpolation convention to drift).

    Scale shape: one explode of the corpus by B into a groupBy
    (group, b) whose partial aggregation collapses map-side to
    B rows per group per partition; the CI step sorts B means per
    group (bounded arrays). Replicates with an empty draw (possible
    only for tiny groups) drop out of the order statistics in both
    engines.

    Output: (group_by..., n_rows, mean, ci_lo, ci_hi).
    """
    B = n_replicates
    lo = lo_rank if lo_rank is not None else max(1, -(-25 * B // 1000))
    hi = hi_rank if hi_rank is not None else -(-975 * B // 1000)
    gb = list(group_by)
    b = F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col(id_col).cast("string"),
                    F.col("__b").cast("string"),
                    F.lit(seed),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    m = F.when(u < POISSON1_CDF_U32[0], 0)
    for k in range(1, 5):
        m = m.when(u < POISSON1_CDF_U32[k], k)
    m = m.otherwise(5).cast("bigint")
    base = df.select(
        *gb, F.col(id_col), F.col(value_col).cast("long").alias("__v")
    )
    reps = (
        base.select(*gb, F.col(id_col), "__v", b)
        .withColumn("__m", m)
        .groupBy(*gb, "__b")
        .agg(
            F.sum(F.col("__m") * F.col("__v")).cast("long").alias("__s"),
            F.sum("__m").cast("long").alias("__n"),
        )
        .withColumn(
            "__mean",
            F.when(
                F.col("__n") > 0,
                F.col("__s").cast("double") / F.col("__n").cast("double"),
            ),
        )
        .filter(F.col("__mean").isNotNull())
        .groupBy(*gb)
        .agg(F.sort_array(F.collect_list("__mean")).alias("__means"))
    )
    exact = base.groupBy(*gb).agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.sum("__v").cast("double") / F.count("*").cast("double")).alias(
            "mean"
        ),
    )
    # guard both ranks against a short means array (a tiny group can
    # draw empty replicates; ANSI element_at would throw out-of-bounds)
    sz = F.size("__means")
    safe_lo = F.when(sz >= lo, F.element_at("__means", lo))
    safe_hi = F.when(sz >= 1, F.element_at("__means", F.least(F.lit(hi), sz)))
    return exact.join(reps, gb).select(
        *gb,
        "n_rows",
        "mean",
        safe_lo.alias("ci_lo"),
        safe_hi.alias("ci_hi"),
    )
