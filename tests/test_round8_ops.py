"""Round-8 operator tests: ADVICE hardening (MAD strict threshold,
ivfpq id-column ambiguity, CMS probe-column collisions), sample-
trained ANN quantizers, and the persistable IVF-PQ store."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------


def test_mad_zero_never_flags_the_median_itself(spark):
    """MAD = 0 (majority-identical series): rows equal to the median
    must NOT flag (strict >); deviating rows still do."""
    from docker_etl_spark.operators.profiling import mad_outliers

    rows = [(i, 100) for i in range(20)] + [(20, 101), (21, 400)]
    df = spark.createDataFrame(rows, "t int, x int")
    out = {r.t: r for r in mad_outliers(df, "t", "x").collect()}
    assert out[0].mad == 0
    assert not any(out[t].outlier for t in range(20))  # value == median
    assert out[20].outlier and out[21].outlier  # any deviation flags


def test_ivfpq_topk_rejects_ambiguous_index_columns(spark):
    from docker_etl_spark.operators.similarity import ivfpq_build, ivfpq_topk

    em = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(8)],
        "vec_id long, dv array<double>",
    )
    index, cents, books = ivfpq_build(
        em, "dv", "vec_id", dim=2, n_cells=2, m=1, k=2
    )
    poisoned = index.withColumn("extra_attr", F.lit("x"))
    with pytest.raises(ValueError, match="exactly one id column"):
        ivfpq_topk(
            em.limit(1), poisoned, cents, books, vec_col="dv",
            query_id_col="vec_id", topk=1,
        )


def test_cms_estimate_rejects_reserved_probe_columns(spark):
    from docker_etl_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    sk = count_min_sketch(df, "k", depth=2, width=16)
    bad = spark.createDataFrame([("a", 1)], "k string, n int")
    with pytest.raises(ValueError, match="collide"):
        cms_estimate(sk, bad, "k", depth=2, width=16)
