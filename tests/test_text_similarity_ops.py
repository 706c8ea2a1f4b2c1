"""Semantic unit tests for the LLM-data operators (dedup, similarity,
text analysis) — properties the differential oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from docker_etl_spark.operators.text_analysis import (
    bpe_ish_token_count,
    quality_features,
)
from docker_etl_spark.operators.text_dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from docker_etl_spark.sources.io import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_minhash_fast_finds_known_near_dup(spark, sf_dir):
    """The corpus contains a ~0.97-Jaccard pair; the xxhash64 LSH
    configuration must recover it (S-curve knee well below 0.97)."""
    pairs = minhash_near_duplicates(
        _docs(spark, sf_dir), num_perm=64, bands=8, threshold=0.8, hash_fn="xxhash64"
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert any(j >= 0.9 for (_, _, j) in [(r.id_a, r.id_b, r.jaccard) for r in pairs])
    # cross-check against exhaustive blocked jaccard
    exact = ngram_jaccard_pairs(
        _docs(spark, sf_dir), length_tolerance=50, threshold=0.8
    ).collect()
    exact_pairs = {(r.id_a, r.id_b) for r in exact}
    assert exact_pairs <= found or exact_pairs & found, (exact_pairs, found)


def test_simhash_detects_near_dup(spark, sf_dir):
    pairs = simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=12).collect()
    # the known near-dup pair should have a small hamming distance
    assert any(r.hamming <= 12 for r in pairs), pairs[:5]


def test_simhash_rejects_lossy_block_bits(spark, sf_dir):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=8, block_bits=16)


def test_simhash_exact_dup_single_chunk(spark, sf_dir):
    """max_hamming=0 → one 64-bit-wide chunk; the full-width mask must
    not overflow a JVM long literal, and exact duplicates must pair."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "something else")],
        "doc_id int, text string",
    )
    pairs = simhash_near_duplicates(docs, max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_simhash_backtick_column_name(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id int, `my text` string"
    )
    pairs = simhash_near_duplicates(docs, text_col="my text", max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_simhash_packed_caps_token_count(spark):
    """Documents beyond the 32767-token ANSI-safe bound use a prefix
    signature rather than corrupting lane counters or raising
    ARITHMETIC_OVERFLOW: a 70k-token doc's signature equals its
    32767-token prefix's."""
    from docker_etl_spark.operators.text_dedup import simhash64_packed

    row = spark.range(1).select(
        simhash64_packed(
            "transform(sequence(1, 70000), i -> string(pmod(i, 97)))"
        ).alias("full"),
        simhash64_packed(
            "transform(sequence(1, 32767), i -> string(pmod(i, 97)))"
        ).alias("prefix"),
    ).first()
    assert row.full == row.prefix


def test_simhash_packed_matches_reference(spark, sf_dir):
    """The SWAR kernel must produce bit-identical signatures to the
    64-slot reference fold on real document text."""
    from docker_etl_spark.operators.text_dedup import simhash64, simhash64_packed

    d = _docs(spark, sf_dir).limit(200)
    both = d.select(
        simhash64(F.split(F.lower("text"), " ")).alias("ref"),
        simhash64_packed("split(lower(text), ' ')").alias("packed"),
    )
    diff = both.filter(F.col("ref") != F.col("packed")).count()
    assert diff == 0


def test_ann_lsh_overlaps_bruteforce(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), vec.alias("vec")
    )
    c = em.select(F.col("vec_id").alias("corpus_id"), vec.alias("vec"))
    brute = cosine_topk_bruteforce(q, c, k=5)
    lsh = cosine_topk_lsh(q, c, dim=64, k=5, n_planes=4, n_tables=16)
    b = {(r.query_id, r.corpus_id) for r in brute.collect()}
    lsh_rows = lsh.collect()
    l = {(r.query_id, r.corpus_id) for r in lsh_rows}
    # These embeddings are near-random (weak neighbor structure), so
    # absolute recall is data-limited; 4-plane/16-table buckets must
    # still recover a meaningful fraction of the true top-5 sets.
    recall = len(b & l) / len(b)
    assert recall >= 0.25, f"LSH recall too low: {recall}"
    # And every cosine the LSH path reports must equal the brute-force
    # cosine for that pair (same expression, candidates only).
    bcos = {(r.query_id, r.corpus_id): r.cosine for r in brute.collect()}
    for r in lsh_rows:
        if (r.query_id, r.corpus_id) in bcos:
            assert abs(r.cosine - bcos[(r.query_id, r.corpus_id)]) < 1e-12


def test_quality_features_ranges(spark, sf_dir):
    qf = quality_features(_docs(spark, sf_dir)).collect()
    assert len(qf) > 0
    for r in qf:
        assert r.n_tokens > 0
        for ratio in (r.stopword_ratio, r.punct_ratio, r.upper_ratio, r.distinct_token_ratio):
            assert ratio is None or 0.0 <= ratio <= 1.0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [("hello, world! it's 42",), ("one",), ("",)], ["text"]
    ).select(bpe_ish_token_count("text").alias("n"))
    rows = [r.n for r in df.collect()]
    # "hello , world ! it ' s 42" → punctuation split out
    assert rows[0] >= 6
    assert rows[1] == 1


def test_x12_recovers_planted_near_duplicates(spark, sf_dir, qdf):
    """The sign-LSH near-dup query must recover every planted
    perturbed-copy pair (cosine ≈ 1) — a recall check, since the
    random fixture itself has no near-dups (max cosine ≈ 0.51)."""
    from docker_etl_spark.queries import QUERIES

    rows = qdf("x12_embedding_near_dups").collect()
    planted = {(r.id_a, r.id_b) for r in rows if r.id_b >= 1_000_000}
    assert planted == {(i, i + 1_000_000) for i in range(20)}
    assert all(r.cosine > 0.999 for r in rows if r.id_b >= 1_000_000)


def test_bigram_lm_scores_rank_shredded_text_low(spark):
    from docker_etl_spark.operators.text_analysis import bigram_lm_scores

    fluent = "the cat sat on the mat and the cat sat on the mat again"
    rows = [(i, fluent) for i in range(8)] + [
        (100, "mat the on cat sat zq xv bn qp wk jh")  # shredded transitions
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # Every fluent copy shares transitions -> high mean score; the
    # shredded doc's transitions are mostly singletons -> lowest.
    assert out[100]["lm_score"] < min(out[i]["lm_score"] for i in range(8))
    # One-token / empty docs emit no row at all.
    df2 = spark.createDataFrame([(1, "solo"), (2, "")], "doc_id long, text string")
    assert bigram_lm_scores(df2).count() == 0


def test_label_centroid_outliers_finds_planted_mislabel(spark):
    from docker_etl_spark.operators.similarity import label_centroid_outliers

    # Two tight clusters; vector 99 carries label 0 but sits at the
    # label-1 cluster's location -> must rank as label 0's top outlier.
    rows = []
    for i in range(20):
        rows.append((i, 0, [0.1] * 8))
        rows.append((50 + i, 1, [0.9] * 8))
    rows.append((99, 0, [0.9] * 8))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = label_centroid_outliers(df, k=2)
    top0 = [r for r in out.collect() if r["label"] == 0 and r["rank"] == 1]
    assert len(top0) == 1 and top0[0]["vec_id"] == 99
    # Determinism under repartitioning.
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, label_centroid_outliers(df.repartition(7), k=2).collect()))
    assert a == b


def test_vocab_oov_stats_flags_junk_doc(spark):
    from docker_etl_spark.operators.text_analysis import vocab_oov_stats

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(10)] + [(99, "zzq xvk wqj")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in vocab_oov_stats(df, vocab_size=5).collect()}
    # Junk doc: every token outside the top-5 vocabulary.
    assert out[99]["oov_rate"] == 1.0 and out[99]["n_oov"] == 3
    # Common docs: tokens 'the cat sat on mat' = 5 distinct; top-5
    # vocab covers all but possibly boundary ties -> low OOV.
    assert out[0]["oov_rate"] <= 0.2


def test_bruteforce_topk_rejects_oversized_query_set(spark):
    import pytest

    from docker_etl_spark.operators.similarity import cosine_topk_bruteforce

    vec = "array(cast(1.0 as float)) as vec"
    corpus = spark.range(3).selectExpr("id as corpus_id", vec)
    ok = spark.range(5).selectExpr("id as query_id", vec)
    assert cosine_topk_bruteforce(ok, corpus, k=2).count() > 0
    too_big = spark.range(10_001).selectExpr("id as query_id", vec)
    with pytest.raises(ValueError, match="query vectors"):
        cosine_topk_bruteforce(too_big, corpus, k=2)
