"""Edge-case units for the round-3 operator additions (SCD2, column
profiling, decayed window sum, BM25). Mainline correctness is covered
by the oracle rows (d07 / pr01 / w09 / x25) in the differential suite;
these pin the corners the oracles can't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_etl_spark.operators.profiling import profile_columns
from docker_etl_spark.operators.scd import scd2_build
from docker_etl_spark.operators.text_analysis import bm25_term_scores
from docker_etl_spark.operators.windows import decayed_window_sum


def test_scd2_null_attr_and_multi_attr(spark):
    rows = [
        # key 1: status NULL -> NULL (no change) -> 'a' (change)
        (1, 1, None, "x"),
        (1, 2, None, "x"),
        (1, 3, "a", "x"),
        # key 2: second attr changes while first stays
        (2, 1, "a", "x"),
        (2, 2, "a", "y"),
    ]
    df = spark.createDataFrame(rows, "k int, seq int, s1 string, s2 string")
    out = scd2_build(
        df, ["k"], ["seq"], ["s1", "s2"], valid_from_col="seq"
    ).orderBy("k", "valid_from")
    got = [
        (r.k, r.s1, r.s2, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    ]
    assert got == [
        (1, None, "x", 1, 3, False),  # NULL==NULL run collapsed
        (1, "a", "x", 3, None, True),
        (2, "a", "x", 1, 2, False),  # change in second attr opens interval
        (2, "a", "y", 2, None, True),
    ]


def test_profile_columns_approx_mode_single_stream(spark, sf_dir):
    from docker_etl_spark.sources.io import load_table

    cust = load_table(spark, sf_dir, "customer")
    exact = profile_columns(cust, ["c_custkey", "c_mktsegment"], exact=True)
    approx = profile_columns(cust, ["c_custkey", "c_mktsegment"], exact=False)
    # approx mode must not plan the per-distinct-column Expand
    assert "Expand" in exact._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx._jdf.queryExecution().executedPlan().toString()
    e = {r.column_name: r for r in exact.collect()}
    a = {r.column_name: r for r in approx.collect()}
    assert e.keys() == a.keys()
    for c in e:
        assert e[c].n_nulls == a[c].n_nulls
        assert e[c].min_value == a[c].min_value
        # HLL estimate within 15% of truth
        assert abs(a[c].n_distinct - e[c].n_distinct) <= max(
            2, 0.15 * e[c].n_distinct
        )


def test_decayed_window_sum_short_series_exact(spark):
    # Series shorter than the lookback: weights still 2**-rows_back.
    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 8), ("a", 3, 16)], "k string, t int, v int"
    )
    out = decayed_window_sum(df, ["k"], ["t"], "v", lookback=7)
    got = {r.t: r.decayed_sum for r in out.collect()}
    assert got == {1: 4.0, 2: 8.0 + 2.0, 3: 16.0 + 4.0 + 1.0}


def test_bm25_no_match_docs_absent_and_saturation(spark):
    df = spark.createDataFrame(
        [
            (1, "spark hash join hash"),
            (2, "window scan filter"),
            (3, "nothing relevant here"),
        ],
        "doc_id int, text string",
    )
    out = bm25_term_scores(df, ("hash", "window"), id_col="doc_id")
    rows = {(r.doc_id, r.term): r for r in out.collect()}
    assert set(rows) == {(1, "hash"), (2, "window")}  # doc 3 emits nothing
    r = rows[(1, "hash")]
    assert r.tf == 2 and r.df == 1
    # saturation: score bounded by odds_idf * (k1 + 1)
    n_docs, df_t, k1 = 3, 1, 1.25
    assert 0 < r.score < ((n_docs - df_t + 0.5) / (df_t + 0.5)) * (k1 + 1)


def test_retention_cohorts_small_fixture(spark):
    from docker_etl_spark.operators.aggregates import retention_cohorts

    rows = [
        # user 1: active week of 2024-01-01 (Mon) and 2024-01-15 -> weeks 0, 2
        (1, "2024-01-02 10:00:00"), (1, "2024-01-16 09:00:00"),
        # user 2: same cohort, never returns -> week 0 only
        (2, "2024-01-03 11:00:00"),
        # user 3: cohort of 2024-01-08, returns next week
        (3, "2024-01-09 08:00:00"), (3, "2024-01-15 12:00:00"),
        # duplicate events in one week collapse
        (1, "2024-01-02 23:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = {(str(r["cohort_week"]), r["weeks_since"]): r["n_active"]
           for r in retention_cohorts(ev).collect()}
    assert out[("2024-01-01", 0)] == 2   # users 1 and 2
    assert out[("2024-01-01", 2)] == 1   # user 1 returns in week 2
    assert out[("2024-01-08", 0)] == 1
    assert out[("2024-01-08", 1)] == 1
    assert ("2024-01-01", 1) not in out  # nobody returned in week 1


def test_histogram_drift_detects_planted_shift(spark):
    from docker_etl_spark.operators.profiling import histogram_drift

    same_a = spark.range(200).selectExpr("50 + id % 10 AS v")
    same_b = spark.range(200).selectExpr("50 + id % 10 AS v")
    shifted = spark.range(200).selectExpr("250 + id % 10 AS v")

    flat = histogram_drift(same_a, same_b, "v", bucket_width=30, n_buckets=10)
    assert all(r["drift_term"] == 0.0 for r in flat.collect())

    moved = histogram_drift(same_a, shifted, "v", bucket_width=30, n_buckets=10)
    rows = {r["bucket"]: r for r in moved.collect()}
    # All of a in bucket 1, all of b in bucket 8; both terms maximal.
    assert rows[1]["n_a"] == 200 and rows[1]["n_b"] == 0
    assert rows[8]["n_b"] == 200 and rows[8]["n_a"] == 0
    assert rows[1]["drift_term"] > 0 and rows[8]["drift_term"] > 0
