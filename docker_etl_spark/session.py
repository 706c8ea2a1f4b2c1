"""SparkSession factory with scale-oriented defaults.

The reference delegates execution to BigQuery; here the engine IS
Spark, so session configuration is where the physical-execution
defaults live. Defaults are chosen for correctness-stability between
engines (UTC timezone, ANSI-ish casts via try_* at call sites) and
for scale (AQE on, skew-join handling on, partition-overwrite
dynamic so D3-style idempotent partition replaces work).

Reference behaviours mirrored:
- UTC session timezone (reference: jobs/mozaggregator2bq/bin/
  pg_dump_to_parquet.py:50 sets spark.sql.session.timeZone=UTC).
- Dynamic partition overwrite for idempotent partition replacement
  (reference: jobs/webcompat-kb/webcompat_kb/etl/siterank.py:114-135
  delete+insert by yyyymm).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults applied to every session the engine builds. Any of these
# can be overridden via the ``extra_conf`` argument.
_ENGINE_DEFAULTS: dict[str, str] = {
    # Determinism / cross-engine comparability
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime shuffle-partition coalescing, skew
    # join splitting, and dynamic join-strategy switching. Essential
    # at 100 TB; harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Nested-field pruning so struct projections reach the parquet
    # scan (SURVEY.md §4 "column pruning by hand" → built-in here).
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Arrow for any pandas interchange (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Idempotent partition replace (D3): only overwrite partitions
    # present in the incoming DataFrame.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Broadcast threshold: dims like region/nation/part are tiny even
    # at SF100k; keep autoBroadcast generous (64 MB) so star joins
    # broadcast instead of shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Partition-discovery listing: above this many paths Spark lists
    # via a SCHEDULED JOB (~0.5-0.7 s of scheduling at any scale);
    # below it, on the driver. The default 32 turns every read of a
    # 256-directory digest store into a job that spends 50x longer
    # scheduling than listing (local-FS directory listing is sub-ms
    # per path). 1024 keeps metadata reads driver-side for every
    # store layout the engine writes (≤16^2 digest prefixes, ≤~1k
    # term-prefix/cell dirs); object-store deployments with slow
    # LIST calls can lower it via extra_conf or the env knob.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": os.environ.get(
        "SPARK_GRAFT_PARTITION_DISCOVERY_THRESHOLD", "1024"
    ),
}


def default_parallelism() -> int:
    """CPU budget for local mode; the driver exports SPARK_GRAFT_CPUS."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "docker-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Parameters
    ----------
    master:
        Spark master URL. Defaults to ``local[$SPARK_GRAFT_CPUS]``;
        on a real cluster pass the cluster master (or rely on
        spark-submit's configuration by passing ``master=""``).
    shuffle_partitions:
        Post-shuffle partition count. Locally this should match the
        core count; on a cluster, ~2-3x total cores (AQE coalesces
        down, so err high).
    """
    builder = SparkSession.builder.appName(app_name)
    if master != "":
        builder = builder.master(master or f"local[{default_parallelism()}]")
    conf = dict(_ENGINE_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else default_parallelism()
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
