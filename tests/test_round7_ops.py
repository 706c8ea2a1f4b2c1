"""Round-7 operator tests: fused MinHash fold equivalence, streaming
delivery independence from session overwrite mode, store-lease
hardening, PSI clamp, compaction atomicity, MMR id types."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Fused MinHash fold — signatures bit-identical to the unfused shape
# ---------------------------------------------------------------------------


def _unfused_signature(shingles, num_perm, hash_fn):
    """The pre-round-7 reference shape: num_perm separate
    array_min(transform(...)) passes. Kept here as the equivalence
    oracle for the fused aggregate fold."""
    if hash_fn == "md5":
        def h(i):
            return F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(f"p{i}"))))
            )
    else:
        def h(i):
            return F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))
            )
    return F.array(*[h(i) for i in range(num_perm)])


@pytest.mark.parametrize("hash_fn,num_perm", [("md5", 12), ("xxhash64", 16)])
def test_minhash_fused_fold_matches_unfused(spark, hash_fn, num_perm):
    from docker_etl_spark.operators.text_dedup import (
        minhash_signature,
        word_shingles,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content about spark pruning"),
        (4, "two words"),        # < shingle_n tokens -> empty shingles
        (5, ""),                 # empty text
        (6, None),               # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = df.select("doc_id", word_shingles(F.col("text"), 3).alias("sh"))
    got = sh.select(
        "doc_id", minhash_signature(F.col("sh"), num_perm, hash_fn).alias("sig")
    )
    want = sh.select(
        "doc_id", _unfused_signature(F.col("sh"), num_perm, hash_fn).alias("sig")
    )
    diff = (
        got.alias("a")
        .join(want.alias("b"), "doc_id")
        .where(~F.expr("a.sig <=> b.sig"))
        .count()
    )
    assert diff == 0
    # empty-shingle docs produce the all-NULL signature, same as before
    nulls = got.filter(F.col("doc_id").isin(4, 5, 6)).collect()
    for r in nulls:
        assert r.sig == [None] * num_perm
    # NULL shingles column (not just empty) also yields the all-NULL sig
    null_sh = spark.createDataFrame([(9,)], "doc_id int").select(
        "doc_id", F.lit(None).cast("array<string>").alias("sh")
    )
    r = null_sh.select(
        minhash_signature(F.col("sh"), num_perm, hash_fn).alias("sig")
    ).first()
    assert r.sig == [None] * num_perm


# ---------------------------------------------------------------------------
# Streaming delivery must not depend on session partitionOverwriteMode
# ---------------------------------------------------------------------------


def test_minhash_stream_survives_static_overwrite_mode(spark, tmp_path):
    """The per-batch survivors write sets partitionOverwriteMode=dynamic
    ON THE WRITER. Under a session pinned to Spark's default STATIC
    mode, batch N's write must still replace only out/__batch_id=N —
    not wipe every earlier batch's partition (the silent-loss failure
    ADVICE r6 flagged)."""
    from docker_etl_spark.streaming import minhash_dedup_stream

    schema = "doc_id bigint, text string"
    b0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], schema
    )
    b1 = spark.createDataFrame(
        [(2, "completely different content about spark shuffle pruning")], schema
    )
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    sink = minhash_dedup_stream(store, out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        sink(b0, 0)
        sink(b1, 1)
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert got == [1, 2]  # batch 0's partition survived batch 1's write
        # and redelivery of batch 1 still replaces (not duplicates) it
        sink(b1, 1)
        got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert got == [1, 2]
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
