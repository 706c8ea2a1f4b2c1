"""Round-6 operator tests: SemDeDup tier-skip + config guards,
scan-free dry-run, store maintenance, single-writer guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_round5_ops import _skewed_embeddings


# ---------------------------------------------------------------------
# semantic_dedup: config validation + scale-unsafe warning + tier skip
# ---------------------------------------------------------------------


def test_semantic_dedup_rejects_zero_planes(spark):
    """sub_bucket_planes=0 must raise, not silently fall through to
    auto-sizing (it used to be falsy under `or`)."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    df = _skewed_embeddings(spark, n_big=10, n_small=3)
    with pytest.raises(ValueError, match="sub_bucket_planes"):
        semantic_dedup(df, k=2, max_cluster_size=4, sub_bucket_planes=0)


def test_semantic_dedup_warns_on_scale_unsafe_config(spark):
    """Pinned plane count with no star fallback is the measured
    374x-at-100x trap — it must warn loudly; the explicit silencer
    (differential-oracle replays) and the default config must not."""
    import warnings

    from docker_etl_spark.operators.similarity import semantic_dedup

    df = _skewed_embeddings(spark, n_big=10, n_small=3)
    with pytest.warns(UserWarning, match="quadratic"):
        semantic_dedup(
            df, k=2, max_cluster_size=4, sub_bucket_planes=2, star_bucket_cap=None
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # silenced replay config
        semantic_dedup(
            df,
            k=2,
            max_cluster_size=4,
            sub_bucket_planes=2,
            star_bucket_cap=None,
            warn_scale_unsafe=False,
        )
        # default (auto star tier) — linear path, nothing to warn about
        semantic_dedup(df, k=2, max_cluster_size=4, sub_bucket_planes=2)


def test_semantic_dedup_tier_skip_when_probe_bounds_buckets(spark):
    """When the k-row size probe proves no cluster exceeds the star
    cap, the tier machinery (stats aggregate + broadcast join) must
    vanish from the plan entirely — and results must be identical to
    a run where the machinery does execute."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    df = _skewed_embeddings(spark, n_big=20, n_small=5)
    # probe runs (default cap), bound 25+twins << cap -> tier skipped
    skipped = semantic_dedup(df, k=2, threshold=0.999)
    assert "__bn" not in skipped._jdf.queryExecution().analyzed().toString()
    # no probe (cap None) + explicit star cap -> machinery must run
    ran = semantic_dedup(
        df, k=2, threshold=0.999, max_cluster_size=None, star_bucket_cap=100_000
    )
    assert "__bn" in ran._jdf.queryExecution().analyzed().toString()
    assert sorted(map(tuple, skipped.collect())) == sorted(
        map(tuple, ran.collect())
    )
