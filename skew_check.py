"""Skew-robustness check: the scale_check.py twin for Zipfian data.

scale_check.py shows the kernels scale linearly on a uniform-ish
corpus; real 100 TB crawl data is power-law — one domain holds a large
corpus fraction, one boilerplate cluster has thousands of members, and
those members collapse into hot LSH buckets / a giant embedding
cluster. This harness derives TWO corpora of identical row counts from
sf0.1:

- uniform: scale_check's replica derivation (suffixed tokens, rotated
  embeddings — no cross-replica near-dups);
- zipf: same row count, but 40% of documents are near-dup variants of
  ONE boilerplate text in ONE hot domain, and 40% of embeddings sit in
  one giant cluster (with jitter, so they are near- but not exact
  dups).

It then times the dedup/clustering kernels on both and prints the
zipf/uniform wall ratio — the guards (LSH max_bucket_size, domain-cap
windows, semantic_dedup's oversized-cluster sub-bucketing) are what
keep that ratio bounded instead of quadratic. Two operator-level
probes measure the guards directly:

- semantic_dedup on the zipf embeddings with the sub-bucket cap
  engaged vs disabled (same n_members, guarded drops <= exact drops);
- salted_sum / salted_join_hot_keys vs their unsalted twins on a
  70%-hot key (bit-equal results; wall ratio reported).

Usage: python skew_check.py [--replicas 4]
Writes derived parquet under /tmp/docker_etl_spark_skew/.
Results are recorded in BASELINE.md ("Skew audit").
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
from scale_check import BASE, build_scaled, time_query

HOT_DOMAIN = "hot.example.com"
BOILERPLATE = (
    "the shared boilerplate navigation header copyright notice terms of "
    "service privacy policy contact about subscribe newsletter follow us "
    "on social media all rights reserved"
)
KERNELS = [
    "x05_minhash_lsh_near_dups",
    "x20_dedup_clusters",
    "x27_domain_cap",
    "x33_dedup_keep_best",
    "x37_semantic_dedup",
    "x45_incremental_minhash_dedup",
    # round 6: the decontamination probe (hot-bucket guard in its
    # store-only form), the CC-backed split repair (one giant
    # component on the zipf corpus), and the CDC fold (expected
    # skew-neutral: per-doc map work).
    "x64_fuzzy_decontamination",
    "x63_leakage_safe_split",
    "x66_cdc_chunk_census",
    # x72: the zipf corpus's boilerplate clone block shares every
    # winnowing fingerprint — posting lists of ~40% of the corpus,
    # exactly what the hot-posting guard (max_posting=1000) exists
    # to drop before the self-join goes quadratic.
    "x72_winnow_pairs",
    # round 7: the xxhash64 decontamination probe — same store-probe
    # shape and hot-bucket guard as x64, fused signature fold
    "x76_fuzzy_decontamination_fast",
]


def build_zipf(spark, uniform_dir: str, out_dir: str) -> None:
    """Derive the Zipfian twin from the uniform corpus (same ids,
    same row counts — only the VALUE distribution changes)."""
    docs = load_table(spark, uniform_dir, "documents")
    hot = F.col("doc_id") % 5 < 2  # 40%
    zipf_docs = docs.select(
        "doc_id",
        F.when(
            hot,
            F.concat(
                F.lit(BOILERPLATE + " variant token"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        F.when(hot, F.lit(HOT_DOMAIN)).otherwise(F.col("source")).alias("source"),
    )
    zipf_docs = zipf_docs.withColumn("n_chars", F.length("text"))
    emb = load_table(spark, uniform_dir, "embeddings")
    hot_v = F.col("vec_id") % 5 < 2
    # giant cluster: one dominant direction + deterministic per-vector
    # jitter (near-dups, not exact dups)
    giant = F.transform(
        F.col("embedding"),
        lambda v, i: (
            F.lit(10.0)
            + ((F.col("vec_id") * (i + 3)) % 97).cast("double") * F.lit(0.001)
        ).cast("float"),
    )
    zipf_emb = emb.select(
        "vec_id",
        F.when(hot_v, giant).otherwise(F.col("embedding")).alias("embedding"),
        "label",
    )
    zipf_docs.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    zipf_emb.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def probe_semantic_dedup_cap(spark, zipf_dir: str) -> dict:
    """Time the oversized-cluster sub-bucketing against the exact
    pass on the zipf embeddings, and verify the one-sided contract."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    em = load_table(spark, zipf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("dv")
    )

    def run(cap):
        t0 = time.monotonic()
        rows = semantic_dedup(
            em, vec_col="dv", id_col="vec_id", k=8, iterations=2,
            threshold=0.999, max_cluster_size=cap,
        ).collect()
        return time.monotonic() - t0, {r.cluster_id: r for r in rows}

    t_exact, exact = run(None)
    t_capped, capped = run(500)
    ok = set(exact) == set(capped) and all(
        capped[c].n_members == exact[c].n_members
        and capped[c].n_dropped <= exact[c].n_dropped
        for c in exact
    )
    return {
        "sec_exact": round(t_exact, 2),
        "sec_subbucketed": round(t_capped, 2),
        "speedup": round(t_exact / max(t_capped, 1e-9), 2),
        "contract_ok": ok,
    }


def probe_salted_twins(spark) -> dict:
    """70%-hot key derived from sf0.1 events: salted_sum and
    salted_join_hot_keys must equal their plain twins; report walls."""
    from docker_etl_spark.operators.skew import salted_join_hot_keys, salted_sum

    ev = load_table(spark, BASE, "events").select(
        F.when(F.pmod("event_id", F.lit(10)) < 7, 0)
        .otherwise(F.pmod("event_id", F.lit(10)))
        .cast("long")
        .alias("k"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    ).localCheckpoint(eager=True)

    t0 = time.monotonic()
    plain_sum = {r.k: r["sum(v)"] for r in ev.groupBy("k").agg(F.sum("v")).collect()}
    t_plain = time.monotonic() - t0
    t0 = time.monotonic()
    salted = {
        r.k: r.v
        for r in salted_sum(ev, ["k"], ["v"], salt_buckets=32, salt_on=["event_id"]).collect()
    }
    t_salted = time.monotonic() - t0
    sum_ok = set(salted) == set(plain_sum) and all(
        abs(salted[k] - plain_sum[k]) < 1e-6 * max(1.0, abs(plain_sum[k]))
        for k in plain_sum
    )

    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "k long, name string")
    hot = spark.createDataFrame([(0,)], "k long")
    t0 = time.monotonic()
    n_plain = ev.join(dim, "k").count()
    t_jplain = time.monotonic() - t0
    t0 = time.monotonic()
    n_salted = salted_join_hot_keys(ev, dim, "k", hot, salt_buckets=16).count()
    t_jsalted = time.monotonic() - t0
    return {
        "salted_sum": {
            "sec_plain": round(t_plain, 2),
            "sec_salted": round(t_salted, 2),
            "equal": sum_ok,
        },
        "salted_join": {
            "sec_plain": round(t_jplain, 2),
            "sec_salted": round(t_jsalted, 2),
            "equal": n_plain == n_salted,
            "rows": n_plain,
        },
    }


def probe_fuzzy_er_skew(spark) -> dict:
    """x85's natural adversary: a HOT LENGTH BAND (many same-length
    vendor-code names — here 60% of entities are 10-char codes). The
    length band alone would go quadratic inside that band; the
    attribute block (``block_cols``) is the shipped guard that bounds
    per-band population. Reported: zipf/uniform wall ratio WITH
    blocks (the shipped x85 config — should stay ~1) and, on a small
    corpus, the UNBLOCKED ratio (what the guard prevents)."""
    from docker_etl_spark.operators.joins import fuzzy_entity_match

    def corpus(n: int, hot: bool, n_blocks: int):
        code = F.concat(
            F.lit("S"),
            F.lpad(F.pmod(F.col("id"), F.lit(9000)).cast("string"), 9, "0"),
        )
        spread = F.concat(
            F.lit("supplier-name-"),
            F.col("id").cast("string"),
            F.repeat(F.lit("x"), F.pmod("id", F.lit(12)).cast("int")),
        )
        name = F.when(F.pmod("id", F.lit(10)) < 6, code).otherwise(
            spread
        ) if hot else spread
        return (
            spark.range(n)
            .select(
                F.col("id").alias("ent_id"),
                F.pmod("id", F.lit(n_blocks)).alias("blk"),
                name.alias("name"),
            )
            .localCheckpoint(eager=True)
        )

    def wall(df, blocks):
        t0 = time.monotonic()
        fuzzy_entity_match(
            df, id_col="ent_id", name_col="name", max_distance=2,
            block_cols=blocks,
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    def candidate_mass(df, blocks) -> int:
        """Exact equi-join candidate-pair count of the length-band
        recipe (a-side band vs bb emitted into band ±1) — the
        quadratic mass itself, independent of per-pair verify cost."""
        width = 3  # max_distance + 1
        b = df.select(
            *blocks, (F.length("name").cast("long") / width).cast("long").alias("__band")
        ).groupBy(*blocks, "__band").agg(F.count("*").alias("n"))
        bb = b.select(
            *blocks,
            F.explode(
                F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
            ).alias("__band"),
            F.col("n").alias("m"),
        ).groupBy(*blocks, "__band").agg(F.sum("m").alias("m"))
        return (
            b.join(bb, [*blocks, "__band"])
            .agg(F.sum(F.col("n") * F.col("m")))
            .collect()[0][0]
        )

    n, n_blocks = 20_000, 100
    uni, zipf = corpus(n, False, n_blocks), corpus(n, True, n_blocks)
    t_u = min(wall(uni, ("blk",)) for _ in range(2))
    t_z = min(wall(zipf, ("blk",)) for _ in range(2))
    return {
        "blocked_n20k": {
            "sec_uniform": round(t_u, 2),
            "sec_zipf": round(t_z, 2),
            "ratio": round(t_z / t_u, 2),
        },
        "zipf_candidate_pairs": {
            "unblocked": int(candidate_mass(zipf, ())),
            "blocked": int(candidate_mass(zipf, ("blk",))),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=4)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated kernel subset (skips the operator probes "
        "unless they are named: semantic_dedup_cap, salted_twins)",
    )
    args = ap.parse_args()
    spark = get_spark(
        app_name="skew-check", extra_conf={"spark.driver.memory": "12g"}
    )
    root = "/tmp/docker_etl_spark_skew"
    uniform_dir = os.path.join(root, "uniform")
    zipf_dir = os.path.join(root, "zipf")
    build_scaled(spark, uniform_dir, args.replicas)
    build_zipf(spark, uniform_dir, zipf_dir)

    only = set(args.only.split(",")) if args.only else None
    results: dict = {"kernels": {}}
    for name in KERNELS:
        if only is not None and name not in only:
            continue
        try:
            t_u = time_query(spark, name, uniform_dir)
            t_z = time_query(spark, name, zipf_dir)
            results["kernels"][name] = {
                "sec_uniform": round(t_u, 3),
                "sec_zipf": round(t_z, 3),
                "ratio": round(t_z / t_u, 2),
            }
        except Exception as ex:
            results["kernels"][name] = {"error": str(ex).split("\n")[0][:300]}
        print(name, results["kernels"][name], flush=True)

    if only is None or "semantic_dedup_cap" in only:
        results["semantic_dedup_cap"] = probe_semantic_dedup_cap(spark, zipf_dir)
        print("semantic_dedup_cap", results["semantic_dedup_cap"], flush=True)
    if only is None or "salted_twins" in only:
        results["salted_twins"] = probe_salted_twins(spark)
        print("salted_twins", results["salted_twins"], flush=True)
    if only is None or "fuzzy_er" in only:
        results["fuzzy_er"] = probe_fuzzy_er_skew(spark)
        print("fuzzy_er", results["fuzzy_er"], flush=True)
    results["replicas"] = args.replicas
    print(json.dumps(results))


if __name__ == "__main__":
    main()
