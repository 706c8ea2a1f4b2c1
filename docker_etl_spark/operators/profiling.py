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


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    snapshot_col: str,
    bucket_width: int,
    n_buckets: int = 10,
    drift_threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index per group between two snapshots —
    the industry-standard drift gate (PSI < 0.1 stable, > 0.2 shifted)
    that complements :func:`histogram_drift`'s chi-square with a
    smoothed, scale-free statistic comparable across groups.

        PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

    over ``n_buckets`` fixed-width buckets with add-1 smoothing (so
    empty buckets contribute finitely). ``snapshot_col`` is 0 for the
    baseline slice, 1 for the current one. The bucket index is
    clamped at BOTH ends — ``greatest(least(floor(v/w), n-1), 0)`` —
    so negative values count in bucket 0 instead of silently falling
    off the spine left-join and vanishing from the totals (ADVICE r6).

    Cross-engine exactness: with integer counts a_i, b_i and totals
    A, B, each component is num_i * lw_i where
    num_i = (a_i+1)(B+n) - (b_i+1)(A+n) is EXACT bigint and
    lw_i = round(1e6 * ln((a_i+1)(B+n) / ((b_i+1)(A+n)))) is the one
    quantized floating step (the x56 dim-edge discipline) — the
    per-group accumulation is exact integer math, and the published
    PSI is two identical double divisions of the same integers in
    both engines. The exact-int products cap the slice size at ~1e9
    rows per side (num_i must stay under 2^63); past that, switch the
    accumulators to DECIMAL(38,0) — PSI tolerances dwarf the
    rounding, but the differential fixtures pin the exact form.

    Scale shape: one scan → one groupBy to (groups x buckets x 2)
    rows; the spine/total joins and the window run on that tiny
    aggregate, never on the corpus.

    Output: (group_col, n_base, n_current, psi, drifted).
    """
    bkt = F.greatest(
        F.least(F.floor(F.col(value_col) / bucket_width), F.lit(n_buckets - 1)),
        F.lit(0),
    ).cast("long")
    g = (
        df.select(
            F.col(group_col), bkt.alias("__bkt"), F.col(snapshot_col).alias("__s")
        )
        .groupBy(group_col, "__bkt")
        .agg(
            F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
            .cast("long")
            .alias("__a"),
            F.sum(F.when(F.col("__s") == 1, 1).otherwise(0))
            .cast("long")
            .alias("__b"),
        )
    )
    spine = (
        df.select(group_col)
        .distinct()
        .select(
            group_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("__bkt"),
        )
        .select(group_col, F.col("__bkt").cast("long").alias("__bkt"))
    )
    f = spine.join(g, [group_col, "__bkt"], "left").select(
        group_col,
        "__bkt",
        F.coalesce(F.col("__a"), F.lit(0)).cast("long").alias("__a"),
        F.coalesce(F.col("__b"), F.lit(0)).cast("long").alias("__b"),
    )
    return psi_from_counts(f, group_col, n_buckets, drift_threshold)


def psi_from_counts(
    f: DataFrame,
    group_col: str,
    n_buckets: int,
    drift_threshold: float = 0.2,
) -> DataFrame:
    """PSI from pre-bucketed counts: ``f`` carries one row per
    (group, bucket) over the COMPLETE ``n_buckets`` spine with
    ``__a`` (baseline count) and ``__b`` (current count). Shared by
    :func:`psi_drift` (both sides from one frame) and the streaming
    admission gate (baseline from a persisted histogram store,
    current from the micro-batch). Same exact-integer discipline —
    see :func:`psi_drift`."""
    wg = Window.partitionBy(group_col)
    n = F.lit(int(n_buckets)).cast("long")
    ta = F.sum("__a").over(wg).cast("long")
    tb = F.sum("__b").over(wg).cast("long")
    p_num = (F.col("__a") + 1) * (tb + n)
    q_num = (F.col("__b") + 1) * (ta + n)
    lw = F.round(
        F.log(p_num.cast("double") / q_num.cast("double")) * 1000000
    ).cast("long")
    comp = f.select(
        group_col,
        ta.alias("__ta"),
        tb.alias("__tb"),
        (p_num - q_num).cast("long").alias("__num"),
        lw.alias("__lw"),
    )
    agg = comp.groupBy(group_col).agg(
        F.min("__ta").alias("__ta"),
        F.min("__tb").alias("__tb"),
        F.sum(F.col("__num") * F.col("__lw")).cast("long").alias("__pn"),
    )
    den = ((F.col("__ta") + n) * (F.col("__tb") + n)).cast("double")
    psi = F.col("__pn").cast("double") / den / F.lit(1000000.0)
    return agg.select(
        group_col,
        F.col("__ta").alias("n_base"),
        F.col("__tb").alias("n_current"),
        psi.alias("psi"),
        (psi > F.lit(float(drift_threshold))).alias("drifted"),
    )


def value_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: int,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-(group, bucket) counts over the fixed-width bucketing the
    PSI family uses — the tiny dim a drift baseline persists
    (groups x n_buckets rows). Sparse: absent buckets are implied 0
    (the spine is rebuilt at comparison time)."""
    bkt = F.greatest(
        F.least(F.floor(F.col(value_col) / bucket_width), F.lit(n_buckets - 1)),
        F.lit(0),
    ).cast("long")
    return (
        df.select(F.col(group_col), bkt.alias("__bkt"))
        .groupBy(group_col, "__bkt")
        .agg(F.count("*").cast("long").alias("__n"))
    )


# ---------------------------------------------------------------------------
# declarative data-quality expectations (data contracts)
# ---------------------------------------------------------------------------


def expect_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations per column: rows where the column is NULL. One scan
    for the whole column list (conditional counts, no per-check
    pass)."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias(c)
        for c in cols
    ]
    row = df.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {stack}) as (target, n_violations)"
    ).select(
        F.lit("not_null").alias("check"), "target", "n_violations"
    )


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations: rows beyond the first per key (COUNT(*) - COUNT
    (DISTINCT key) in aggregate form — the dbt `unique` test). One
    groupBy on the key."""
    dup_rows = (
        df.groupBy(*cols)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.sum(F.col("count") - 1).alias("n"))
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"))
    )
    return dup_rows.select(
        F.lit("unique").alias("check"),
        F.lit(",".join(cols)).alias("target"),
        F.col("n").alias("n_violations"),
    )


def expect_accepted_values(
    df: DataFrame, col: str, values: list[str]
) -> DataFrame:
    """Violations: non-NULL values outside the accepted set (dbt
    `accepted_values`). Map-side filter + count."""
    n = (
        df.filter(F.col(col).isNotNull() & ~F.col(col).isin(*values))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return n.select(
        F.lit("accepted_values").alias("check"),
        F.lit(col).alias("target"),
        F.col("n").alias("n_violations"),
    )


def expect_references(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str
) -> DataFrame:
    """Violations: non-NULL foreign keys with no parent row (dbt
    `relationships`). left_anti against the (distinct) parent keys —
    broadcast when small, hash join when not; never materializes the
    match set."""
    orphans = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("__k"))
        .join(
            ref.select(F.col(ref_col).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return orphans.select(
        F.lit("references").alias("check"),
        F.lit(col).alias("target"),
        F.col("n").alias("n_violations"),
    )


def expectation_report(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check frames into one (check, target,
    n_violations, passed) report — the shape a warehouse admission
    gate consumes (reference pattern: webcompat-kb's ad-hoc
    validation queries, systematized)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("n_violations") == 0)


def expect_freshness(
    df: DataFrame, ts_col: str, as_of: str, max_lag_hours: int
) -> DataFrame:
    """Freshness check (dbt source freshness): the newest event must
    be within ``max_lag_hours`` of ``as_of`` (an explicit timestamp —
    never wall-clock, so runs are reproducible). Violations = 0 or 1
    (the table is stale or it isn't); lag rides in the target label
    for the report reader."""
    agg = df.agg(F.max(F.col(ts_col)).alias("mx"))
    lag_h = (
        F.timestamp_diff(
            "SECOND", F.col("mx"), F.lit(as_of).cast("timestamp_ntz")
        ).cast("double")
        / 3600.0
    )
    return agg.select(
        F.lit("freshness").alias("check"),
        F.concat(F.lit(ts_col), F.lit("<="), F.lit(str(max_lag_hours)), F.lit("h")).alias(
            "target"
        ),
        F.when(
            F.col("mx").isNull() | (lag_h > max_lag_hours), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_violations"),
    )


def kanon_aggregate(
    df: DataFrame,
    keys: list[str],
    entity_col: str,
    min_entities: int,
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate with k-anonymity small-cell suppression — the
    publish-safety guard every reference dashboard applies implicitly
    by sampling (graphics_dashboard.sql's 1% + per-client dedup) made
    explicit: no published row may describe fewer than
    ``min_entities`` distinct entities. Suppressed groups are NOT
    dropped — they collapse into one rollup row with NULL keys, so
    column totals survive suppression (the property auditors check).

    Two passes, both key-grouped: (1) per-group distinct-entity
    counts + sums; (2) the suppressed groups' rows re-aggregated as
    one bucket via a key semi-join (exact distinct count across the
    collapsed groups — summing per-group distincts would overcount
    entities spanning groups). The semi-join's right side is the
    small-group key list; Spark broadcasts it when small, shuffles
    when a pathological key space makes it big.

    Returns keys + (n_entities bigint, sums...); suppressed rollup
    row appears only when at least one group was suppressed.

    CAVEAT: the rollup row uses NULL key values, so a corpus whose
    key columns legitimately contain NULLs would make a genuine
    NULL-keyed group indistinguishable from the rollup — coalesce
    such keys to a sentinel before calling (the fixture tables'
    grouping keys are non-null).
    """
    sum_cols = list(sum_cols or [])
    aggs = [F.count_distinct(F.col(entity_col)).cast("bigint").alias("n_entities")] + [
        F.sum(c).alias(c) for c in sum_cols
    ]
    g = df.groupBy(*keys).agg(*aggs)
    ok = g.filter(F.col("n_entities") >= min_entities)
    small_keys = g.filter(F.col("n_entities") < min_entities).select(*keys)
    rollup = (
        df.join(small_keys, keys, "left_semi")
        .agg(*aggs)
        .select(
            *[F.lit(None).cast(dict(g.dtypes)[k]).alias(k) for k in keys],
            "n_entities",
            *sum_cols,
        )
        .filter(F.col("n_entities") > 0)
    )
    return ok.unionByName(rollup)


def psi_drift_equidepth(
    df: DataFrame,
    group_col: str,
    value_col: str,
    snapshot_col: str,
    n_buckets: int = 10,
    drift_threshold: float = 0.2,
) -> DataFrame:
    """:func:`psi_drift` with EQUI-DEPTH buckets: bucket edges are
    the baseline snapshot's own per-group ``percentile_disc``
    quantiles (the standard production recipe — fixed-width buckets
    under- or over-resolve whichever region the baseline mass
    actually occupies, quantile edges put ~equal baseline mass in
    every bucket so the statistic is sensitive everywhere).

    Edges are exact integers (percentile_disc picks an actual value),
    bucket assignment is an integer comparison fold, and the PSI
    accumulation reuses :func:`psi_from_counts` — the same
    exact-math/quantized-ln discipline end-to-end. Only groups
    present in the baseline are scored (no edges, no gate — the
    caller decides what a brand-new group means).

    Scale shape: one percentile aggregate to k group rows, broadcast
    as the edge dim (the adaptive-floor pattern); bucket assignment
    is map-side; everything after runs on (groups x buckets) rows.
    """
    base = df.filter(F.col(snapshot_col) == 0)
    ps = [i / n_buckets for i in range(1, n_buckets)]
    edges = base.groupBy(group_col).agg(
        F.array(
            *[
                F.expr(
                    f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})"
                ).cast("long")
                for p in ps
            ]
        ).alias("__edges")
    )
    joined = df.join(F.broadcast(edges), group_col)
    bkt = F.size(
        F.filter(F.col("__edges"), lambda e: F.col(value_col) > e)
    ).cast("long")
    g = (
        joined.select(
            F.col(group_col),
            bkt.alias("__bkt"),
            F.col(snapshot_col).alias("__s"),
        )
        .groupBy(group_col, "__bkt")
        .agg(
            F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
            .cast("long")
            .alias("__a"),
            F.sum(F.when(F.col("__s") == 1, 1).otherwise(0))
            .cast("long")
            .alias("__b"),
        )
    )
    spine = edges.select(
        group_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("__bkt"),
    ).select(group_col, F.col("__bkt").cast("long").alias("__bkt"))
    f = spine.join(g, [group_col, "__bkt"], "left").select(
        group_col,
        "__bkt",
        F.coalesce(F.col("__a"), F.lit(0)).cast("long").alias("__a"),
        F.coalesce(F.col("__b"), F.lit(0)).cast("long").alias("__b"),
    )
    return psi_from_counts(f, group_col, n_buckets, drift_threshold)


def cusum_alarm(
    df: DataFrame,
    time_col: str,
    value_col: str,
    threshold_scaled: int,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """One-sided CUSUM change-point detection over a per-period
    metric series — the LEVEL-SHIFT monitor complementing the PSI
    family's distribution drift (reference analogue: search-alert's
    lag-window anomaly checks, generalized to the textbook
    sequential statistic).

    The textbook recurrence S_t = max(0, S_{t-1} + d_t) is not a
    window function, but it has a windowable closed form:
    ``S_t = P_t - min(P_0..P_t)`` where P is the running prefix sum
    of deviations (the min term includes P_t itself, so S_t >= 0
    automatically). Deviations are exact scaled integers:
    d_t = n_periods * x_t - total (i.e. x_t - mean, scaled by
    n_periods), so the whole statistic replays bit-for-bit and the
    alarm is an integer compare against ``threshold_scaled`` (in the
    same n_periods scale).

    Scale shape: the input is already a per-period aggregate (one row
    per period per group) — the two windows order by time within
    each group, bounded by the TIME domain, not the data (the x80
    bucket-window class). The raw-event aggregation upstream is the
    caller's normal groupBy.

    Output: (group_by..., time_col, value, cusum_scaled, alarm).
    """
    gb = list(group_by)
    w_all = Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1))
    w_ord = w_all.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stats = df.select(
        *gb,
        F.col(time_col),
        F.col(value_col).cast("long").alias("__x"),
        F.count("*").over(w_all).cast("long").alias("__n"),
        F.sum(F.col(value_col).cast("long")).over(w_all).alias("__tot"),
    )
    dev = F.col("__n") * F.col("__x") - F.col("__tot")
    with_pref = stats.select(
        *gb,
        time_col,
        F.col("__x").alias("value"),
        F.sum(dev).over(w_ord).alias("__p"),
    )
    run_min = F.min(F.least(F.col("__p"), F.lit(0).cast("long"))).over(w_ord)
    with_p = with_pref.select(*gb, time_col, "value", "__p", run_min.alias("__m"))
    cusum = (F.col("__p") - F.col("__m")).cast("bigint")
    return with_p.select(
        *gb,
        time_col,
        "value",
        cusum.alias("cusum_scaled"),
        (cusum >= threshold_scaled).alias("alarm"),
    )


def mad_outliers(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_by: Sequence[str] = (),
    z_num: int = 6745,
    z_den: int = 30000,
) -> DataFrame:
    """Robust per-period outlier flags via the median absolute
    deviation — the heavy-tail-safe sibling of mean/std z-scores
    (one genuine anomaly inflates a standard deviation enough to
    hide itself; the median and MAD don't move). Flag when

        0.6745 * |x - median| / MAD > 3
        <=> z_num * |x - median| > z_den * MAD   (exact integers)

    with 0.6745 the normal-consistency constant, folded with the
    3-sigma threshold into one integer cross-multiplication — no
    floating step anywhere, so every flag replays cross-engine.

    Medians are RANK statistics (the ceil(n/2)-th smallest value, no
    interpolation): med = the k-th smallest value, MAD = the k-th
    smallest |x - med|. Both come from row_number windows over the
    per-period aggregate — time-domain-bounded rows per group (the
    x80/x86 window class), never the raw corpus.

    Output: (group_by..., time_col, value, median, mad, outlier).
    MAD = 0 (over half the values identical) flags every period
    with value != median (the strict > keeps value == median rows
    clean even then) — documented behaviour of the estimator.
    """
    gb = list(group_by)
    part = Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1))
    base = df.select(
        *gb, F.col(time_col), F.col(value_col).cast("long").alias("value")
    )
    w1 = part.orderBy(F.asc("value"), F.asc(time_col))
    k = F.ceil(F.count("*").over(part) / 2).cast("long")
    with_med = base.select(
        *gb,
        time_col,
        "value",
        F.max(
            F.when(F.row_number().over(w1) == k, F.col("value"))
        ).over(part).alias("median"),
    )
    dev = F.abs(F.col("value") - F.col("median"))
    w2 = part.orderBy(F.asc(dev), F.asc(time_col))
    with_mad = with_med.select(
        *gb,
        time_col,
        "value",
        "median",
        F.max(F.when(F.row_number().over(w2) == k, dev)).over(part).alias(
            "mad"
        ),
    )
    flag = (
        F.lit(z_num) * F.abs(F.col("value") - F.col("median"))
        > F.lit(z_den) * F.col("mad")
    )
    return with_mad.select(
        *gb, time_col, "value", "median", "mad", flag.alias("outlier")
    )


def theil_sen_trend(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Robust per-group trend slope: the Theil–Sen estimator — the
    MEDIAN of all pairwise slopes (y_j − y_i)/(x_j − x_i), tolerant
    of ~29% arbitrary outliers where least squares is poisoned by
    one. Completes the robust-monitoring family (x88 flags point
    outliers, x86 level shifts; THIS answers "is the metric actually
    trending, ignoring the junk?").

    Determinism: x is the per-period index (day number), so each
    slope is ONE IEEE division of exact integers — bit-identical in
    any engine — and the median is a rank statistic (the
    ceil(n_pairs/2)-th smallest slope), no interpolation.

    Scale shape: the pairwise self-join is quadratic in PERIODS, not
    rows — the input contract is a per-period aggregate (the
    x80/x86/x88 class), so a year of daily points is ~66k pairs per
    group; the join is a cell-bounded equi-join on the group key and
    the raw corpus is never touched.

    Output: (group_by..., n_periods, slope_per_period).
    """
    gb = list(group_by)
    base = df.select(
        *gb,
        F.col(time_col),
        F.col(value_col).cast("long").alias("__y"),
    )
    part = Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1))
    idx = base.select(
        *gb,
        F.row_number().over(part.orderBy(time_col)).cast("long").alias("__x"),
        "__y",
    )
    a = idx.select(
        *gb, F.col("__x").alias("__xa"), F.col("__y").alias("__ya")
    )
    b = idx.select(
        *gb, F.col("__x").alias("__xb"), F.col("__y").alias("__yb")
    )
    on = gb if gb else None
    pairs = (
        # ungrouped: one side broadcasts (periods are bounded), so the
        # pair join is BroadcastNestedLoop, never a CartesianProduct
        (a.join(b, on) if on else a.crossJoin(F.broadcast(b)))
        .filter(F.col("__xa") < F.col("__xb"))
        .select(
            *gb,
            (
                (F.col("__yb") - F.col("__ya")).cast("double")
                / (F.col("__xb") - F.col("__xa")).cast("double")
            ).alias("__slope"),
        )
    )
    return (
        pairs.groupBy(*gb)
        .agg(F.sort_array(F.collect_list("__slope")).alias("__s"))
        .select(
            *gb,
            F.size("__s").cast("long").alias("n_pairs"),
            F.element_at(
                "__s", F.ceil(F.size("__s") / 2).cast("int")
            ).alias("slope_per_period"),
        )
    )


def seasonal_mad_outliers(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_by: Sequence[str] = (),
    season_origin: str = "1995-01-01",
    season_len: int = 7,
    z_num: int = 6745,
    z_den: int = 30000,
) -> DataFrame:
    """Seasonality-aware robust outliers — :func:`mad_outliers` with
    a per-season baseline first: a weekly rhythm (Mondays always
    high) would otherwise either inflate the global MAD until real
    anomalies hide, or flag every Monday. Season = days since
    ``season_origin`` mod ``season_len`` (pure integer arithmetic —
    no calendar/locale functions, so the key is bit-identical in any
    engine). The mod is ``pmod``, NOT ``%``: Spark's and DuckDB's
    ``%`` both take the dividend's sign, so rows dated BEFORE the
    origin would get season keys in {-(n-1)..0} and the same weekday
    would silently split into two baseline buckets on either side of
    the origin (r8 ADVICE); pmod keeps every date — past or future —
    in [0, season_len). The per-(group, season) baseline is the rank-statistic
    median (k-th smallest, k = ceil(n/2), no interpolation), and the
    MAD flag runs on the RESIDUALS value − season_median with the
    same strict integer cross-multiplication as the plain monitor.

    Input contract is the x80/x86/x88 class: a per-period aggregate,
    so every window is bounded by the TIME domain, never the corpus.
    Output: (group_by..., time_col, value, season, season_median,
    resid, resid_median, resid_mad, outlier).
    """
    gb = list(group_by)
    base = df.select(
        *gb,
        F.col(time_col),
        F.col(value_col).cast("long").alias("value"),
        F.pmod(
            F.datediff(F.col(time_col), F.lit(season_origin)),
            F.lit(season_len),
        ).cast("int").alias("season"),
    )
    spart = Window.partitionBy(*gb, "season") if gb else Window.partitionBy(
        "season"
    )
    w1 = spart.orderBy(F.asc("value"), F.asc(time_col))
    ks = F.ceil(F.count("*").over(spart) / 2).cast("long")
    with_base = base.select(
        *gb,
        time_col,
        "value",
        "season",
        F.max(F.when(F.row_number().over(w1) == ks, F.col("value")))
        .over(spart)
        .alias("season_median"),
    ).withColumn("resid", F.col("value") - F.col("season_median"))
    part = Window.partitionBy(*gb) if gb else Window.partitionBy(F.lit(1))
    w2 = part.orderBy(F.asc("resid"), F.asc(time_col))
    k = F.ceil(F.count("*").over(part) / 2).cast("long")
    with_med = with_base.select(
        *gb,
        time_col,
        "value",
        "season",
        "season_median",
        "resid",
        F.max(F.when(F.row_number().over(w2) == k, F.col("resid")))
        .over(part)
        .alias("resid_median"),
    )
    dev = F.abs(F.col("resid") - F.col("resid_median"))
    w3 = part.orderBy(F.asc(dev), F.asc(time_col))
    with_mad = with_med.select(
        *gb,
        time_col,
        "value",
        "season",
        "season_median",
        "resid",
        "resid_median",
        F.max(F.when(F.row_number().over(w3) == k, dev)).over(part).alias(
            "resid_mad"
        ),
    )
    flag = (
        F.lit(z_num) * F.abs(F.col("resid") - F.col("resid_median"))
        > F.lit(z_den) * F.col("resid_mad")
    )
    return with_mad.select(
        *gb,
        time_col,
        "value",
        "season",
        "season_median",
        "resid",
        "resid_median",
        "resid_mad",
        flag.alias("outlier"),
    )
