"""Super-linearity spot-check for the iterative/dedup kernels.

Derives a 10x corpus from sf0.1 (replica tokens are suffixed per
replica so replicas are NOT near-duplicates of each other — pure
duplication would quadratically inflate candidate pairs as a data
artifact, masking the kernel's own scaling), then times the five
heaviest kernels at 1x and 10x and prints sec ratios. Near-linear
kernels should land <= ~12x for 10x rows; anything far above that
has a hidden super-linear term.

Usage: python scale_check.py [--replicas 10]
Writes scaled parquet under /tmp/docker_etl_spark_scale/.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from docker_etl_spark.queries import QUERIES
from docker_etl_spark.session import get_spark
from docker_etl_spark.sources.io import load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KERNELS = [
    "x05_minhash_lsh_near_dups",
    "x09_minhash_fast",
    "x20_dedup_clusters",
    "x23_kmeans_ivf_train",
    "x33_dedup_keep_best",
    "x37_semantic_dedup",
    "x41_dedup_clusters_twophase",
    "x45_incremental_minhash_dedup",
    "x53_incremental_minhash_fast",
    "x47_incremental_embedding_dedup",
    "x48_semantic_dedup_subbucketed",
    "x49_semantic_dedup_star",
    "x54_cross_doc_span_dedup",
    "x56_dsir_select",
    "x58_bpe_merges",
    "x59_bpe_tokenize",
    "x60_matryoshka_recall",
    "x61_mmr_rerank",
    "x62_psi_drift",
    "x63_leakage_safe_split",
    "x64_fuzzy_decontamination",
    "x65_corpus_diversity",
    "x66_cdc_chunk_census",
    "x67_training_order",
    "x68_psi_equidepth",
    "x69_source_containment",
    "x70_containment_join",
    "x71_estimator_precision",
    "x72_winnow_pairs",
    "x73_weighted_sample",
    "x74_weighted_sample_per_group",
    "x76_fuzzy_decontamination_fast",
    "x77_corpus_diversity_approx",
    "x79_count_min_frequencies",
    "x80_quantile_rollup",
    "x81_pq_adc_topk",
    "x82_ivfpq_topk",
    "x83_shard_packing",
    "x87_ivfpq_nprobe2",
    "x90_ivfpq_store_probe",
    "x91_ivfpq_append_probe",
    "x92_ivfpq_refined",
    "x93_ivfpq_recall_eval",
    "x94_ann_lsh_multiprobe",
    "x95_seasonal_mad_outliers",
    "x96_bm25_index_search",
    "x97_bm25_index_append",
    "x98_bm25_batch_search",
    "x99_bm25_recall_eval",
    "x100_phrase_search",
    "x101_proximity_search",
    "x102_pmi_collocations",
    "x103_phrase_batch_search",
    "x104_proximity_batch_search",
    "x105_search_index_census",
    "x106_phrase_match_positions",
    "cp06_index_guided_scrub",
    "x107_prefix_search",
    "x108_fuzzy_term_suggest",
    "cp05_pmi_expanded_retrieval",
    "x109_bm25_stopword_skip",
    "x110_search_dictionary",
    "x111_positional_quality_eval",
    "cp07_snippet_extraction",
    "cp08_relevance_feedback",
    "x112_boolean_search",
    "x113_ordered_window_search",
    "x114_phrase_prefix_search",
    "x115_ordered_window_batch",
    "x116_fuzzy_suggest_batch",
    "x117_search_delete_lifecycle",
    "x118_ivfpq_delete_lifecycle",
    "x119_maxscore_pruned_topk",
    "cp09_bm25_term_snippets",
    "x120_bm25_proximity_boost",
    "x121_digest_purge_reopen",
    "x122_maxscore_batch",
    # cp02 (full curation pipeline) is excluded: the replica corpus
    # suffixes every token with "_N", which fails the quality gate's
    # alpha-fraction test and empties the pipeline after stage 1 — the
    # measured ratio (0.65) reflects the gate, not the kernels. Every
    # stage is individually swept (quality/x15, dedup/x05, pack/x83).
    # cp03 (streaming curation) is excluded for the same reason — its
    # stage 1 is the same quality gate; its store sinks are swept via
    # x45/x53 (minhash store) and x32 (digest store).
    # x78 (directed PageRank) reads lineitem too, which the scaled
    # corpus does not replicate; its per-round shape is x75's (already
    # covered) plus one 1-row dangling aggregate.
]


def build_scaled(spark, out_dir: str, replicas: int) -> None:
    docs = load_table(spark, BASE, "documents")
    emb = load_table(spark, BASE, "embeddings")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    r = spark.range(replicas).withColumnRenamed("id", "rep")
    scaled_docs = (
        docs.crossJoin(F.broadcast(r))
        .select(
            (F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
            # suffix every token with the replica id: shingle-profile
            # SHAPE is preserved, cross-replica near-dups are not
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled_emb = (
        emb.crossJoin(F.broadcast(r))
        .select(
            (F.col("vec_id") + F.col("rep") * max_vec).alias("vec_id"),
            # rotate components by the replica id so replicas point in
            # different directions (no artificial near-dup cliques)
            F.transform(
                F.col("embedding"),
                lambda v, i: v + (F.col("rep") * (i + 1) % 7).cast("float") * F.lit(0.31),
            ).alias("embedding"),
            "label",
        )
    )
    scaled_docs.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    scaled_emb.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    # orders: key-shifted replicas (x80's quantile daily-state input;
    # the date/priority profile repeats per replica, which is exactly
    # the shape a longer-history corpus would have)
    orders = load_table(spark, BASE, "orders")
    max_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    scaled_orders = orders.crossJoin(F.broadcast(r)).select(
        (F.col("o_orderkey") + F.col("rep") * max_ord).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    scaled_orders.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )


def force_eval(df) -> None:
    """Full evaluation via the noop sink — bench.py's method. NEVER
    time with .count(): Catalyst prunes columns the count doesn't
    need, which can delete an operator's entire expensive stage
    (x37's pair-cosine vanished under count() — the round-4 lesson,
    .claude/skills/verify/SKILL.md)."""
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, name: str, sf_dir: str, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        force_eval(QUERIES[name](spark, sf_dir))
        best = min(best, time.monotonic() - t0)
    return best


def time_semantic_capped(spark, sf_dir: str, passes: int = 2) -> float:
    """SemDeDup in its production configuration: the registry x37
    keeps k=4 for oracle comparability, which makes cluster size grow
    with the corpus — the pair stage is then QUADRATIC in cluster
    size (under honest noop-sink timing, 150 s at 10x, ratio 34.6 —
    the .count() timing of earlier rounds pruned this stage away,
    which is why x37's old ratios looked flat). The production path
    bounds per-cell pair work via the oversized-cluster sign-LSH
    sub-bucketing: cap 250 keeps expected pairs-per-vector constant
    across scales, so cost returns to ~rows-linear."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("dv"),
    )
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        force_eval(
            semantic_dedup(
                em, vec_col="dv", id_col="vec_id", k=4, iterations=2,
                threshold=0.9, max_cluster_size=250, star_bucket_cap=250,
            )
        )
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--skip",
        action="append",
        default=[],
        help="kernel names to skip (e.g. the intentionally-quadratic "
        "uncapped x37 at 100x, where one query would take hours by design)",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated kernel-name substrings; sweep only matches "
        "(the capped-x37 extra sweep is skipped unless it matches too)",
    )
    args = ap.parse_args()
    # local mode defaults to a 1g driver heap — the 10x corpus needs
    # real executor memory (driver == executor in local mode)
    spark = get_spark(
        app_name="scale-check",
        extra_conf={"spark.driver.memory": "12g"},
    )
    out_dir = "/tmp/docker_etl_spark_scale"
    build_scaled(spark, out_dir, args.replicas)

    subs = args.only.split(",") if args.only else None
    results = {}
    for name in KERNELS:
        if subs is not None and not any(s in name for s in subs):
            continue
        if name in args.skip:
            results[name] = {"skipped": True}
            print(name, results[name], flush=True)
            continue
        try:
            t1 = time_query(spark, name, BASE, passes=args.passes)
            t10 = time_query(spark, name, out_dir, passes=args.passes)
            results[name] = {
                "sec_1x": round(t1, 3),
                f"sec_{args.replicas}x": round(t10, 3),
                "ratio": round(t10 / t1, 2),
            }
        except Exception as ex:  # keep probing the other kernels
            results[name] = {"error": str(ex).split("\n")[0][:300]}
        print(name, results[name], flush=True)
    if subs is not None and not any(s in "x37_semantic_dedup_capped" for s in subs):
        print(json.dumps({"replicas": args.replicas, "kernels": results}))
        return
    try:
        t1 = time_semantic_capped(spark, BASE, passes=args.passes)
        t10 = time_semantic_capped(spark, out_dir, passes=args.passes)
        results["x37_semantic_dedup_capped"] = {
            "sec_1x": round(t1, 3),
            f"sec_{args.replicas}x": round(t10, 3),
            "ratio": round(t10 / t1, 2),
        }
    except Exception as ex:
        results["x37_semantic_dedup_capped"] = {"error": str(ex).split("\n")[0][:300]}
    print("x37_semantic_dedup_capped", results["x37_semantic_dedup_capped"], flush=True)
    print(json.dumps({"replicas": args.replicas, "kernels": results}))


if __name__ == "__main__":
    main()
