"""Physical-plan assertions: the scale contract.

Correctness says what a query returns; these tests pin HOW Spark
executes it — filters reach the parquet scan, dimensions broadcast,
top-k avoids global sorts, aggregates run partial+final, and the hot
path never drops into row-at-a-time Python. A regression here is a
100TB regression even when results stay right.
"""

from __future__ import annotations

import pytest

from docker_etl_spark.queries import QUERIES
from docker_etl_spark.sources.io import load_table

from pyspark.sql import functions as F


def formatted(df) -> str:
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir, qdf):
    """P4: the a01 date predicate must appear in PushedFilters."""
    txt = formatted(qdf("a01_pricing_summary"))
    assert "PushedFilters" in txt
    assert "l_shipdate" in txt.split("PushedFilters", 1)[1].splitlines()[0]


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    """Column pruning: a 2-column projection must not scan all 16
    lineitem columns."""
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    txt = formatted(df)
    read_schema_line = [l for l in txt.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema_line
    assert "l_orderkey" in read_schema_line and "l_quantity" in read_schema_line


def test_star_join_broadcasts_dimensions(spark, sf_dir, qdf):
    """J1: supplier/nation/region joins must be BroadcastHashJoin —
    the fact table never shuffles for the join."""
    txt = formatted(qdf("j01_star_revenue"))
    assert txt.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in txt


def test_topk_uses_take_ordered(spark, sf_dir, qdf):
    """O1: ORDER BY + LIMIT must plan TakeOrderedAndProject, not a
    global Sort."""
    txt = formatted(qdf("o01_top_revenue_orders"))
    assert "TakeOrderedAndProject" in txt


def test_aggregate_is_partial_then_final(spark, sf_dir, qdf):
    """A1: hash aggregation must run map-side partial + final."""
    txt = formatted(qdf("a01_pricing_summary"))
    assert "HashAggregate" in txt
    assert "partial_sum" in txt or "Partial" in txt


def test_range_join_is_bucketed_equi(spark, sf_dir, qdf):
    """J6: the date-spine range join runs as a month-bucketed EQUI
    hash join (bucket key + residual range predicate) — never a
    nested loop or cartesian, so the plan survives an orders side
    1000x bigger than the spine."""
    txt = formatted(qdf("j06_orders_active_per_month"))
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt
    assert (
        "BroadcastHashJoin" in txt
        or "ShuffledHashJoin" in txt
        or "SortMergeJoin" in txt
    )


# The ONLY queries allowed an Arrow-batched Python stage: model fit
# (F9) and media kernels — the two workloads the engine explicitly
# quarantines behind applyInPandas/mapInPandas (README design rules).
PANDAS_STAGE_ALLOWED = {
    "f09_forecast_segments",
    "m01_media_features",
    "i01_batched_inference",
}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - PANDAS_STAGE_ALLOWED))
def test_no_python_in_hot_path(spark, sf_dir, name, qdf):
    """Every relational registry query executes fully JVM-side: no
    row-at-a-time Python UDFs (BatchEvalPython) and no Arrow Python
    stages (those live only in the PANDAS_STAGE_ALLOWED set)."""
    txt = formatted(qdf(name))
    assert "BatchEvalPython" not in txt, f"{name} fell back to Python UDF"
    assert "ArrowEvalPython" not in txt, f"{name} uses a pandas UDF"
    assert "MapInPandas" not in txt, f"{name} uses mapInPandas"


def test_whole_stage_codegen_covers_scalar_gauntlet(spark, sf_dir, qdf):
    """§2.8 scalar families must stay inside WholeStageCodegen
    (formatted explain marks codegen'd operators with a '*' prefix)."""
    txt = formatted(qdf("p01_scalar_gauntlet"))
    assert "* Project" in txt, txt


def test_ivf_probe_join_broadcasts(spark, sf_dir, qdf):
    """x13: the cell-probe join must broadcast the (tiny) probe side —
    the assigned corpus never shuffles for it."""
    txt = formatted(qdf("x13_ivf_cosine_topk"))
    assert "SortMergeJoin" not in txt
    assert "BroadcastHashJoin" in txt


def test_boilerplate_antijoin_broadcasts(spark, sf_dir, qdf):
    """x34: the frequent-chunk set is broadcast — the exploded corpus
    must never shuffle for the anti-join (LeftAnti over a broadcast
    exchange, no SortMergeJoin on the digest)."""
    txt = formatted(qdf("x34_strip_boilerplate"))
    assert "BroadcastHashJoin" in txt and "LeftAnti" in txt
    assert "SortMergeJoin LeftAnti" not in txt


def test_cms_probe_broadcasts_sketch(spark, sf_dir, qdf):
    """x79: the Count-Min sketch is bounded (depth x width cells) and
    must be BROADCAST into the probe join — probing never shuffles on
    the sketch side however large the probe set grows."""
    txt = formatted(qdf("x79_count_min_frequencies"))
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin LeftOuter" not in txt


def test_no_cartesian_products_anywhere(spark, sf_dir, qdf):
    """No registry query may plan a CartesianProduct — every join has
    equi keys, a broadcast, or a bounded non-equi broadcast-NL."""
    for name in sorted(QUERIES):
        txt = formatted(qdf(name))
        assert "CartesianProduct" not in txt, name

def test_spread_for_compute_skips_already_parallel_input(spark, sf_dir):
    """spread_for_compute must be a no-op (same object, no new
    Exchange) when the input already meets default parallelism —
    at 100 TB an unconditional round-robin would re-shuffle every
    raw text payload before shingling."""
    from docker_etl_spark.operators._util import spread_for_compute

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target)
    assert spread_for_compute(wide) is wide

    narrow = spark.range(10).coalesce(1)
    plan = formatted(spread_for_compute(narrow))
    assert "Exchange" in plan


def test_intradoc_dedup_is_shuffle_free(spark, sf_dir, qdf):
    """x40's claim: intra-doc repetition removal is one map-side
    fold — no Exchange anywhere (a 100 TB pass at scan speed)."""
    plan = formatted(qdf("x40_intradoc_dedup"))
    assert "Exchange" not in plan


def test_temperature_mixture_broadcasts_threshold_dim(spark, sf_dir, qdf):
    """x38: the census-derived threshold dim must broadcast back over
    the scan — the corpus never shuffles for the keep decision."""
    plan = formatted(qdf("x38_temperature_mixture"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_adaptive_floor_broadcasts_threshold_dim(spark, sf_dir, qdf):
    """x43: the per-group percentile dim must broadcast — the corpus
    never shuffles for the keep decision."""
    plan = formatted(qdf("x43_adaptive_quality_floor"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_expectations_report_has_no_cartesian_and_counts_only(spark, sf_dir, qdf):
    """e01: checks aggregate to counts — no violating-row
    materialization means no wide project after the checks."""
    plan = formatted(qdf("e01_expectations_report"))
    assert "CartesianProduct" not in plan


def test_chunk_windows_is_shuffle_free(spark, sf_dir, qdf):
    """x30's claim: chunking is one map-side pass — the plan must
    contain no Exchange of any kind (chunking 100 TB = one scan)."""
    plan = formatted(qdf("x30_chunk_windows"))
    assert "Exchange" not in plan


def test_mixture_sample_filter_is_map_side(spark, sf_dir, qdf):
    """x21's sampling decision must evaluate before any exchange:
    the only Exchange in the plan belongs to the census aggregation,
    so exactly one (the agg shuffle) may appear."""
    plan = formatted(qdf("x21_mixture_sample"))
    assert plan.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)


def test_digest_store_partition_pruning(spark, sf_dir, tmp_path):
    """x32's 100 TB layout claim, plan-pinned: against a
    write_digest_store layout (partitionBy digest_prefix), the batch
    join must push a static IN on the partition column — the store
    scan reads only the batch's prefix directories."""
    from docker_etl_spark.operators.dedupe import (
        incremental_content_dedup,
        write_digest_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingested = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "content_md5", F.md5("text")
    )
    path = str(tmp_path / "digest_store")
    write_digest_store(ingested.select("content_md5"), path)
    store = spark.read.parquet(path)
    batch = docs.filter(F.col("doc_id") % 20 == 1).limit(8)
    out = incremental_content_dedup(batch, store)
    txt = formatted(out)
    pf_lines = [l for l in txt.splitlines() if "PartitionFilters" in l]
    assert pf_lines, txt
    assert any("digest_prefix" in l and " IN " in l for l in pf_lines), pf_lines
    # and the pruned-path result is still correct: re-delivered
    # content never survives, genuinely new content does
    seen_digests = {r[0] for r in ingested.select("content_md5").collect()}
    for r in out.withColumn("d", F.md5("text")).collect():
        assert r["d"] not in seen_digests


def test_signature_store_partition_pruning(spark, sf_dir, tmp_path):
    """x45's 100 TB layout claim, plan-pinned: a band-subset probe
    against the write_signature_store layout (partitionBy band) pushes
    a static band filter that prunes the store scan."""
    from docker_etl_spark.operators.text_dedup import (
        incremental_minhash_dedup,
        load_signature_store,
        minhash_signature,
        word_shingles,
        write_signature_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingested = docs.filter(F.col("doc_id") % 2 == 0).limit(50)
    sigs = ingested.select(
        "doc_id",
        minhash_signature(word_shingles("text", 3), 12, "md5").alias("sig"),
    )
    path = str(tmp_path / "sig_store")
    write_signature_store(sigs, path, bands=3, num_perm=12)
    store = load_signature_store(spark, path)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(10)
    out = incremental_minhash_dedup(
        batch, store, store_exploded=True, probe_bands=[0]
    )
    txt = formatted(out)
    pf_lines = [l for l in txt.splitlines() if "PartitionFilters" in l]
    assert pf_lines, txt
    assert any("band" in l and ("IN" in l or "= 0" in l) for l in pf_lines), pf_lines
