"""Mergeable sketch state for 100 TB profiling: Count-Min frequency
sketches and histogram-based quantile rollups.

Both follow the engine's cross-engine exactness discipline: the
sketch CONTENT is deterministic integer state (md5-derived bucket
indexes, integer counts), so an independent SQL engine replays the
whole construction bit-for-bit — the estimate itself is
oracle-comparable, not just its error bound. That is stronger than
the HLL/percentile_approx paths (cd01/cd02/x77 compare error bounds
because those sketch bytes are engine-specific); here the sketch IS
portable state a pipeline can persist and merge across engines.

Reference analogues: the per-day materialize-then-merge pattern of
the reference's aggregate ledgers (update-orphaning's longitudinal
histogram algebra; the MAU rollups SURVEY.md §2.4 notes), where raw
events are touched once per day and every wider window is an
algebra over stored per-day state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cms_bucket(key: Column, row: Column, width: int) -> Column:
    """Deterministic row-specific bucket: first 8 md5 hex chars of
    (key, 0x1f, 'cms', row) as an int, mod width — the engine's
    portable-hash idiom (p05 / the mixture-draw family)."""
    h = F.md5(F.concat(key, F.lit("\x1fcms"), row.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) over a
    key column: ``depth`` hash rows x ``width`` buckets of exact
    integer counts. Returns the sketch TABLE (__row, __bucket, n) —
    at most depth*width rows, the persistable/mergeable state (two
    sketches over disjoint data merge by summing counts per cell).

    Estimates (``cms_estimate``) obey the classic one-sided bound:
    est >= true count always, est <= true + eps*N with probability
    1 - delta for width = ceil(e/eps), depth = ceil(ln 1/delta).

    Scale shape: one explode of the corpus by ``depth`` (map-local)
    into a groupBy (__row, __bucket) whose partial aggregation
    collapses each partition to <= depth*width cells before the
    shuffle — the shuffled state is sketch-sized, not corpus-sized,
    the same reason the HLL paths scale. The md5-derived buckets are
    engine-portable, so the sketch replays exactly in the oracle.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row")
    ent = df.select(F.col(key_col).alias("__k")).select("__k", rows)
    return (
        ent.select(
            "__row", _cms_bucket(F.col("__k"), F.col("__row"), width).alias("__bucket")
        )
        .groupBy("__row", "__bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate probe keys against a Count-Min sketch: for each
    key, min over the ``depth`` row cells it hashes to (absent cells
    are exact zeros — no other key hashed there either).

    The sketch is bounded (depth*width rows) and broadcast; probing
    is a map-side join however large the probe set is.

    Output: probes' columns + ``cms_count``.
    """
    clash = {"n", "__row", "__bucket"} & set(probes.columns)
    if clash:
        raise ValueError(
            "cms_estimate: probe columns collide with sketch-internal "
            f"names {sorted(clash)}; rename them before probing"
        )
    p = probes.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row")
    ).withColumn("__bucket", _cms_bucket(F.col(key_col), F.col("__row"), width))
    joined = p.join(F.broadcast(sketch), ["__row", "__bucket"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("cms_count")
        )
    )


def quantile_rollup(
    df: DataFrame,
    unit_col: str,
    rollup_col: str,
    value_col: str,
    bucket_width: int,
    percentiles: Sequence[int] = (50, 95, 99),
) -> tuple[DataFrame, DataFrame]:
    """Mergeable quantile state: per-``unit`` fixed-width integer
    histograms (the materializable daily sketch) merged to
    per-``rollup`` quantile estimates WITHOUT re-scanning raw values
    — cd02's incremental-MAU recipe applied to quantiles (a month =
    summing ~30 stored histogram rows per bucket, not a month-wide
    shuffle of raw values).

    The estimate for percentile p is the LOWER EDGE of the first
    bucket whose running count reaches ceil(p * total / 100) — a
    floor-quantized exact quantile: it differs from the true p-th
    smallest value by less than ``bucket_width`` by construction,
    and being pure integer arithmetic it replays exactly cross-
    engine (no interpolation-convention drift).

    Values must be nonnegative integers (cast/scale upstream; same
    domain contract as the PSI family, which clamps instead because
    its buckets are error terms, not estimates).

    Returns (daily_state, rollup_estimates):
    - daily_state: (unit_col, rollup_col, __bkt, n) — what a pipeline
      persists per day.
    - rollup_estimates: (rollup_col, total_n, p{p} for each p).

    Scale shape: the raw scan aggregates to (units x buckets) rows;
    the rollup runs entirely on that state. The cumulative window
    partitions by ``rollup_col`` over at most (max_value /
    bucket_width) bucket rows — bounded by the value domain, not the
    data.
    """
    bkt = (F.floor(F.col(value_col) / bucket_width)).cast("long")
    daily = (
        df.select(F.col(unit_col), F.col(rollup_col), bkt.alias("__bkt"))
        .groupBy(unit_col, rollup_col, "__bkt")
        .agg(F.count("*").cast("long").alias("n"))
    )
    merged = daily.groupBy(rollup_col, "__bkt").agg(F.sum("n").alias("n"))
    w = Window.partitionBy(rollup_col).orderBy("__bkt")
    cum = merged.select(
        rollup_col,
        "__bkt",
        F.sum("n").over(w).alias("__cum"),
        F.sum("n").over(Window.partitionBy(rollup_col)).alias("__total"),
    )
    aggs = [F.max("__total").cast("long").alias("total_n")]
    for p in percentiles:
        # ceil(p * total / 100) with pure integers: (p*total + 99) div 100
        rank = F.expr(f"cast(({p} * __total + 99) div 100 as bigint)")
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, F.col("__bkt")))
            .cast("long")
            .alias(f"__pb{p}")
        )
    est = cum.groupBy(rollup_col).agg(*aggs)
    out_cols = [rollup_col, "total_n"] + [
        (F.col(f"__pb{p}") * bucket_width).alias(f"p{p}_lo") for p in percentiles
    ]
    return daily, est.select(*out_cols)


def write_cms_store(
    sketch: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Persist a CMS sketch (or per-batch delta) into a mergeable
    store layout. CMS cells merge by SUM, so the store is append-only
    per-batch deltas under ``__batch_id=N`` partitions — redelivery
    of a batch overwrites only its own partition (the engine's
    idempotent streaming delivery contract), and no rewrite of prior
    state is ever needed. Reads go through :func:`load_cms_store`,
    which sums across deltas. Writer-lease-guarded like every store
    mutation."""
    from docker_etl_spark.sources.stores import store_writer_lock

    with store_writer_lock(path, owner="write_cms_store"):
        (
            sketch.withColumn(
                "__batch_id", F.lit(-1 if batch_id is None else batch_id)
            )
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("__batch_id")
            .parquet(path)
        )


def load_cms_store(
    spark, path: str, as_of_batch: int | None = None
) -> DataFrame:
    """Merged view of a CMS store: per-cell sum across all batch
    deltas — at most depth*width rows out regardless of batch count
    (compaction is therefore optional; the merge IS the read).

    ``as_of_batch`` gives TIME TRAVEL for free: deltas are
    partitioned by ``__batch_id``, so filtering ``<= N`` is partition
    pruning at the scan (no data pages of later batches are read)
    and reproduces the sketch exactly as it stood after batch N —
    the lightweight version of a table format's snapshot read.
    """
    df = spark.read.parquet(path)
    if as_of_batch is not None:
        df = df.filter(F.col("__batch_id") <= as_of_batch)
    return (
        df.groupBy("__row", "__bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def write_histogram_store(
    daily: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Persist per-unit histogram state (quantile_rollup's ``daily``
    frame, or any (…, __bkt, n) delta) into the same append-only
    per-batch store layout as :func:`write_cms_store` — histogram
    cells also merge by SUM, so deltas never rewrite prior state and
    redelivery overwrites only its own ``__batch_id`` partition."""
    from docker_etl_spark.sources.stores import store_writer_lock

    with store_writer_lock(path, owner="write_histogram_store"):
        (
            daily.withColumn(
                "__batch_id", F.lit(-1 if batch_id is None else batch_id)
            )
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("__batch_id")
            .parquet(path)
        )


def load_histogram_store(
    spark, path: str, key_cols: Sequence[str], as_of_batch: int | None = None
) -> DataFrame:
    """Merged view of a histogram store: per-(key, bucket) sum across
    batch deltas — bounded by keys x buckets regardless of batch
    count. ``as_of_batch`` = partition-pruned snapshot read (see
    :func:`load_cms_store`)."""
    df = spark.read.parquet(path)
    if as_of_batch is not None:
        df = df.filter(F.col("__batch_id") <= as_of_batch)
    return (
        df.groupBy(*key_cols, "__bkt")
        .agg(F.sum("n").cast("long").alias("n"))
    )
