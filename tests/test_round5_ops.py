"""Round-5 operator tests: stdlib PNG codec capability (the decode
seam exercised on real pixels with no image library), plus the other
round-5 additions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docker_etl_spark.operators import _png


def _test_image(h: int = 8, w: int = 6, c: int = 3) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


# ---------------------------------------------------------------------
# Pure codec unit tests (no Spark)
# ---------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_colortypes(filter_type, channels):
    img = _test_image(c=channels)
    data = _png.encode_png(img, filter_type=filter_type)
    assert data[:8] == _png.PNG_MAGIC
    back = _png.decode_png(data)
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_png_decode_rejects_garbage_and_unsupported():
    with pytest.raises(_png.PngFormatError):
        _png.decode_png(b"not a png at all")
    # 16-bit depth header must be rejected, not mis-decoded
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(_png.PngFormatError):
        _png.decode_png(_png.PNG_MAGIC + chunk)


def test_png_mean_luma_rec601():
    # pure red 2x2 RGB: luma = 255 * 0.299
    red = np.zeros((2, 2, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    assert _png.mean_luma(red) == pytest.approx(255 * 0.299)
    gray = np.full((3, 3), 7, dtype=np.uint8)
    assert _png.mean_luma(gray) == 7.0


# ---------------------------------------------------------------------
# Capability tests through the Spark kernels (run in THIS container —
# the non-PIL siblings of test_multimodal_decode_capability_if_pil_present)
# ---------------------------------------------------------------------


def _media_row(mid: int, payload: bytes, w: int = 0, h: int = 0):
    return (
        mid,
        bytearray(payload),
        {"kind": "image", "width": w, "height": h, "n_frames": 1, "sample_rate": 0},
    )


_MEDIA_DDL = (
    "media_id bigint, content binary, "
    "meta struct<kind string, width int, height int, n_frames int, sample_rate int>"
)


def test_decode_image_features_real_png_capability(spark):
    """A real PNG payload must come back decoded by the stdlib codec
    with the EXACT Rec.601 mean luminance — while an opaque payload in
    the same table takes the labelled stub path (per-payload
    dispatch, no all-or-nothing gate)."""
    from docker_etl_spark.operators.multimodal import decode_image_features

    img = _test_image(5, 4, 3)
    df = spark.createDataFrame(
        [
            _media_row(1, _png.encode_png(img, filter_type=4), 4, 5),
            _media_row(2, b"opaque bytes, no codec"),
        ],
        _MEDIA_DDL,
    )
    rows = {r.media_id: r for r in decode_image_features(df).collect()}
    if rows[1].decoder == "pil":  # pragma: no cover - PIL present
        pytest.skip("PIL took the fast path; stdlib arm covered elsewhere")
    assert rows[1].decoder == "png-stdlib"
    assert rows[1].mean_luma == pytest.approx(_png.mean_luma(img))
    assert rows[2].decoder == "stub"


def test_resize_images_real_png_capability(spark):
    """PNG payloads are really resized: output bytes re-decode to the
    target shape with nearest-neighbor-sampled pixels; opaque payloads
    pass through byte-identical as 'stub'."""
    from docker_etl_spark.operators.multimodal import resize_images

    img = _test_image(8, 6, 3)
    blob = b"not an image"
    df = spark.createDataFrame(
        [_media_row(1, _png.encode_png(img), 6, 8), _media_row(2, blob)],
        _MEDIA_DDL,
    )
    rows = {r.media_id: r for r in resize_images(df, 3, 4).collect()}
    if rows[1].resized_by == "pil":  # pragma: no cover
        pytest.skip("PIL took the fast path")
    assert rows[1].resized_by == "png-stdlib"
    out = _png.decode_png(bytes(rows[1].content))
    assert out.shape == (4, 3, 3)
    ys, xs = (np.arange(4) * 8) // 4, (np.arange(3) * 6) // 3
    assert np.array_equal(out, img[ys][:, xs])
    assert rows[1].meta["width"] == 3 and rows[1].meta["height"] == 4
    assert rows[2].resized_by == "stub" and bytes(rows[2].content) == blob


def test_m01_stub_path_unchanged_by_codec(spark, sf_dir):
    """The documents-derived media table carries utf-8 text payloads —
    no PNG signature — so m01's sha256 stub oracle must keep matching
    after the codec landed (every row still tagged 'stub')."""
    from docker_etl_spark.operators.multimodal import (
        decode_image_features,
        media_table_from_documents,
    )
    from docker_etl_spark.sources.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(20)
    out = decode_image_features(media_table_from_documents(d))
    tags = {r.decoder for r in out.select("decoder").distinct().collect()}
    assert tags == {"stub"}


# ---------------------------------------------------------------------
# semantic_dedup oversized-cluster auto-sub-bucket
# ---------------------------------------------------------------------


def _skewed_embeddings(spark, n_big: int = 60, n_small: int = 5):
    """One giant cluster around e0 (with planted exact twins) and a
    small one around e1."""
    import random as _r

    rng = _r.Random(7)
    rows = []
    for i in range(n_big):
        base = [1.0, 0.0, 0.0, 0.0]
        jitter = [x + rng.uniform(-0.05, 0.05) for x in base]
        rows.append((i, jitter))
    # exact twins of ids 0..4 at high ids
    for j in range(5):
        rows.append((1000 + j, rows[j][1]))
    for i in range(n_small):
        rows.append((2000 + i, [0.0, 1.0, 0.0, rng.uniform(-0.05, 0.05)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_auto_subbuckets_giant_cluster(spark):
    """With a cap far below the giant cluster's size the sub-bucketing
    must engage (sign-LSH inside the cell) while keeping the contract:
    exact twins share every sign bit, so they are STILL dropped; the
    approximation only ever keeps more than the exact pass."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    df = _skewed_embeddings(spark)
    exact = {
        r.cluster_id: r
        for r in semantic_dedup(
            df, k=2, threshold=0.999, max_cluster_size=None
        ).collect()
    }
    sub = {
        r.cluster_id: r
        for r in semantic_dedup(
            df, k=2, threshold=0.999, max_cluster_size=16, star_bucket_cap=None
        ).collect()
    }
    assert set(sub) == set(exact)
    for cid in exact:
        assert sub[cid].n_members == exact[cid].n_members
        # approximation is one-sided: never drops more than exact
        assert sub[cid].n_dropped <= exact[cid].n_dropped
        assert sub[cid].survivor_id_sum >= exact[cid].survivor_id_sum
    # the planted exact twins are dropped even under sub-bucketing
    assert sum(r.n_dropped for r in sub.values()) >= 5


def test_incremental_minhash_exploded_store_matches_plain(spark, sf_dir, tmp_path):
    """The write_signature_store layout is a pure layout change: with
    all bands probed, results are bit-identical to handing the
    operator a plain (id, sig) store."""
    from docker_etl_spark.operators.text_dedup import (
        incremental_minhash_dedup,
        load_signature_store,
        minhash_signature,
        word_shingles,
        write_signature_store,
    )
    from docker_etl_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingested = docs.filter(F.col("doc_id") % 2 == 0).limit(40)
    sigs = ingested.select(
        "doc_id",
        minhash_signature(word_shingles("text", 3), 12, "md5").alias("sig"),
    )
    path = str(tmp_path / "sig_store")
    write_signature_store(sigs, path, bands=3, num_perm=12)
    store = load_signature_store(spark, path)
    # duplicate one ingested doc into the batch so is_dup fires
    dup = ingested.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(10).unionByName(dup)
    a = sorted(
        map(tuple, incremental_minhash_dedup(batch, store, store_exploded=True).collect())
    )
    b = sorted(map(tuple, incremental_minhash_dedup(batch, sigs).collect()))
    assert a == b
    assert any(r[3] for r in a)  # the planted duplicate is flagged


def test_semantic_dedup_default_cap_is_inert_on_small_clusters(spark):
    """x37-unchanged guarantee: with every cluster under the default
    cap, auto mode returns bit-identical results to cap=None."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    df = _skewed_embeddings(spark, n_big=20, n_small=5)
    auto = sorted(map(tuple, semantic_dedup(df, k=2, threshold=0.97).collect()))
    off = sorted(
        map(
            tuple,
            semantic_dedup(df, k=2, threshold=0.97, max_cluster_size=None).collect(),
        )
    )
    assert auto == off


# ---------------------------------------------------------------------
# hashed linear classifier (JVM-side inference fast path)
# ---------------------------------------------------------------------


def test_hashed_linear_scores_explicit_weights(spark):
    """With every bucket weighted 0.5 the score must be exactly
    0.5/token regardless of which buckets tokens hash into — pins the
    weight-array literal path and the exact integer accumulation."""
    from docker_etl_spark.operators.inference import hashed_linear_scores

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in hashed_linear_scores(
            df, n_buckets=64, weights=[0.5] * 64
        ).collect()
    }
    assert out[1].n_tokens == 3 and out[1].score_sum == 1500
    assert out[1].mean_score == pytest.approx(0.5)
    assert out[2].n_tokens == 5 and out[2].score_sum == 2500


def test_hashed_linear_scores_rejects_bad_weights(spark):
    from docker_etl_spark.operators.inference import hashed_linear_scores

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_linear_scores(df, n_buckets=8, weights=[1.0] * 9)


def test_hashed_classifier_plan_is_map_side(spark, sf_dir, qdf):
    """x46: scoring must add NO exchange beyond the input spread and
    no Python stage — the whole classifier is one map-side pass."""
    import contextlib
    import io

    from docker_etl_spark.queries import QUERIES

    df = qdf("x46_hashed_classifier")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    import re

    # one Exchange NODE (the spread repartition); formatted() prints
    # each node once in the tree ("Exchange (2)") and once in details
    n_exchanges = len(re.findall(r"Exchange \(\d+\)", txt))
    assert n_exchanges <= 1, txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_incremental_embedding_exploded_store_matches_plain(spark, sf_dir, tmp_path):
    """write_vector_store layout is a pure layout change: all-tables
    probe against the partitioned store equals the plain (id, vec)
    store bit-for-bit, and a planted near-copy is flagged."""
    from docker_etl_spark.operators.similarity import (
        incremental_embedding_dedup,
        write_vector_store,
    )
    from docker_etl_spark.sources.io import load_table

    em = load_table(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    store = em.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", quant.alias("vec")
    ).limit(60).localCheckpoint(eager=True)
    dup = store.limit(1).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "vec"
    )
    batch = (
        em.filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", quant.alias("vec"))
        .limit(20)
        .unionByName(dup)
    )
    path = str(tmp_path / "vec_store")
    write_vector_store(store, path, dim=64, n_planes=8, n_tables=2)
    loaded = spark.read.parquet(path)
    a = sorted(
        map(
            tuple,
            incremental_embedding_dedup(
                batch, loaded, dim=64, store_exploded=True
            ).collect(),
        )
    )
    b = sorted(
        map(tuple, incremental_embedding_dedup(batch, store, dim=64).collect())
    )
    assert a == b
    assert any(r[3] for r in a)  # the exact planted copy is flagged


def test_vector_store_partition_pruning(spark, sf_dir, tmp_path):
    """A table-subset probe against the partitioned vector store must
    push a static filter on the tbl partition column."""
    import contextlib
    import io

    from docker_etl_spark.operators.similarity import (
        incremental_embedding_dedup,
        write_vector_store,
    )
    from docker_etl_spark.sources.io import load_table

    em = load_table(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    store = em.filter(F.col("vec_id") % 2 == 0).select("vec_id", quant.alias("vec")).limit(40)
    path = str(tmp_path / "vec_store")
    write_vector_store(store, path, dim=64, n_planes=8, n_tables=2)
    loaded = spark.read.parquet(path)
    batch = em.filter(F.col("vec_id") % 2 == 1).select("vec_id", quant.alias("vec")).limit(10)
    out = incremental_embedding_dedup(
        batch, loaded, dim=64, store_exploded=True, probe_tables=[0]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    pf_lines = [l for l in buf.getvalue().splitlines() if "PartitionFilters" in l]
    assert pf_lines
    assert any("tbl" in l and ("IN" in l or "= 0" in l) for l in pf_lines), pf_lines


def test_kanon_aggregate_suppresses_and_preserves_totals(spark):
    """Groups under k collapse into one NULL-keyed rollup; entity
    counts are exact across collapsed groups (entities spanning
    groups counted once) and value totals survive suppression."""
    from docker_etl_spark.operators.profiling import kanon_aggregate

    rows = []
    # big group: 5 entities
    for u in range(5):
        rows.append(("a", u, 10))
    # two small groups sharing entity 100 across both
    rows += [("b", 100, 1), ("b", 101, 2), ("c", 100, 4)]
    df = spark.createDataFrame(rows, "k string, user long, v long")
    out = kanon_aggregate(df, ["k"], "user", 3, ["v"])
    got = {r.k: r for r in out.collect()}
    assert got["a"].n_entities == 5 and got["a"].v == 50
    assert set(got) == {"a", None}
    # entity 100 appears in both suppressed groups but counts once
    assert got[None].n_entities == 2 and got[None].v == 7
    # totals preserved
    assert sum(r.v for r in got.values()) == 57


def test_kanon_aggregate_no_rollup_row_when_nothing_suppressed(spark):
    from docker_etl_spark.operators.profiling import kanon_aggregate

    df = spark.createDataFrame(
        [("a", u, 1) for u in range(4)] + [("b", u, 1) for u in range(4)],
        "k string, user long, v long",
    )
    out = kanon_aggregate(df, ["k"], "user", 3, ["v"]).collect()
    assert sorted(r.k for r in out) == ["a", "b"]


def test_incremental_minhash_redelivery_all_flagged(spark, sf_dir):
    """Idempotence property of the admission gate: re-delivering
    EXACT copies of stored documents must flag every one (identical
    text -> identical signature -> same band keys -> candidate with
    match fraction 1.0)."""
    from docker_etl_spark.operators.text_dedup import (
        incremental_minhash_dedup,
        minhash_signature,
        word_shingles,
    )
    from docker_etl_spark.sources.io import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.size(F.split("text", " ")) >= 3)
        .limit(30)
        .localCheckpoint(eager=True)
    )
    store = docs.select(
        "doc_id",
        minhash_signature(word_shingles("text", 3), 12, "md5").alias("sig"),
    )
    redelivered = docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    out = incremental_minhash_dedup(redelivered, store)
    assert out.count() == 30
    assert out.filter(~F.col("is_dup")).count() == 0
    assert out.agg(F.min("max_est")).collect()[0][0] == 1.0


def test_incremental_embedding_redelivery_all_flagged(spark, sf_dir):
    """Same idempotence property for the embedding gate: identical
    vectors share every sign bit in every table -> cosine 1."""
    from docker_etl_spark.operators.similarity import incremental_embedding_dedup
    from docker_etl_spark.sources.io import load_table

    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", quant.alias("vec"))
        .limit(30)
        .localCheckpoint(eager=True)
    )
    redelivered = vecs.select((F.col("vec_id") + 10_000_000).alias("vec_id"), "vec")
    out = incremental_embedding_dedup(redelivered, vecs, dim=64)
    assert out.count() == 30
    assert out.filter(~F.col("is_dup")).count() == 0


def test_kanon_published_rows_never_under_k(spark):
    """Safety property on a pseudo-random fixture: every published
    (non-rollup) row has >= k entities, and the rollup absorbs the
    rest without losing value mass."""
    import random as _r

    from docker_etl_spark.operators.profiling import kanon_aggregate

    rng = _r.Random(5)
    rows = [
        (f"g{rng.randrange(12)}", rng.randrange(40), rng.randrange(100))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, user long, v long")
    out = kanon_aggregate(df, ["k"], "user", 8, ["v"]).collect()
    published = [r for r in out if r.k is not None]
    assert all(r.n_entities >= 8 for r in published)
    assert sum(r.v for r in out) == sum(v for _, _, v in rows)


def test_semantic_dedup_star_tier_on_tight_bucket(spark):
    """Direction-tight giant bucket: the star tier must engage
    (O(n) hub comparisons), drop the hub's near-twins, and stay
    one-sided vs the exact pass."""
    from docker_etl_spark.operators.similarity import semantic_dedup

    df = _skewed_embeddings(spark, n_big=60, n_small=5)
    exact = {
        r.cluster_id: r
        for r in semantic_dedup(
            df, k=2, threshold=0.999, max_cluster_size=None
        ).collect()
    }
    star = {
        r.cluster_id: r
        for r in semantic_dedup(
            df,
            k=2,
            threshold=0.999,
            max_cluster_size=16,
            star_bucket_cap=16,
        ).collect()
    }
    assert set(star) == set(exact)
    for cid in exact:
        assert star[cid].n_members == exact[cid].n_members
        assert star[cid].n_dropped <= exact[cid].n_dropped
        assert star[cid].survivor_id_sum >= exact[cid].survivor_id_sum
    # the hub of the giant bucket is vec 0 (min id); its exact twin
    # (id 1000) must still be dropped by the hub comparison
    dropped_total = sum(r.n_dropped for r in star.values())
    assert dropped_total >= 1


# ---------------------------------------------------------------------
# compact_parquet layout maintenance
# ---------------------------------------------------------------------


def test_compact_parquet_zorder_clusters_files(spark, sf_dir, tmp_path):
    """A fragmented table compacts into few files whose REAL on-disk
    layout is Z-order-clustered: measured with input_file_name(),
    each compacted file spans far fewer distinct day-of-year values
    than the table holds — the min/max-stats pruning win."""
    from docker_etl_spark.sources.io import compact_parquet, load_table

    src = str(tmp_path / "fragmented")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 512).alias("ck"),
        F.dayofyear(F.col("o_orderdate").cast("date")).alias("dy"),
    )
    o.repartition(40).write.parquet(src)  # fragment: 40 micro-files
    n_in = len([f for f in __import__("os").listdir(src) if f.endswith(".parquet")])
    assert n_in >= 30

    dst = str(tmp_path / "compacted")
    n_rows = o.count()
    n_files = compact_parquet(
        spark, src, dst, zorder=("ck", "dy"), target_rows_per_file=n_rows // 4, bits=9
    )
    n_out = len([f for f in __import__("os").listdir(dst) if f.endswith(".parquet")])
    # the zorder path writes exactly one file per range partition —
    # deterministic count (sampling error moves file SIZE, not count)
    assert n_out == n_files
    assert n_out < n_in / 4

    back = spark.read.parquet(dst)
    assert back.count() == n_rows
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.count_distinct("dy").alias("days"))
        .collect()
    )
    total_days = back.select("dy").distinct().count()
    # clustered layout: every file spans a fraction of the day space
    assert all(r.days < total_days * 0.72 for r in per_file), [
        (r.days, total_days) for r in per_file
    ]


def test_compact_parquet_plain_repartition(spark, sf_dir, tmp_path):
    from docker_etl_spark.sources.io import compact_parquet, load_table

    src = str(tmp_path / "frag2")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    ev.repartition(25).write.parquet(src)
    dst = str(tmp_path / "comp2")
    compact_parquet(spark, src, dst, target_rows_per_file=10**9)
    out_files = [
        f for f in __import__("os").listdir(dst) if f.endswith(".parquet")
    ]
    assert len(out_files) == 1
    assert spark.read.parquet(dst).count() == ev.count()


def test_probe_bands_flags_are_subset_of_full(spark, sf_dir, tmp_path):
    """Staged-screening contract: a 1-band probe may only UNDER-flag
    relative to the full-band pass (its candidate set is a subset and
    the estimator is computed from full signatures either way)."""
    from docker_etl_spark.operators.text_dedup import (
        incremental_minhash_dedup,
        load_signature_store,
        minhash_signature,
        word_shingles,
        write_signature_store,
    )
    from docker_etl_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingested = docs.filter(F.col("doc_id") % 2 == 0).limit(50)
    sigs = ingested.select(
        "doc_id",
        minhash_signature(word_shingles("text", 3), 12, "md5").alias("sig"),
    )
    path = str(tmp_path / "probe_store")
    write_signature_store(sigs, path, bands=3, num_perm=12)
    store = load_signature_store(spark, path)
    dup = ingested.limit(2).select(
        (F.col("doc_id") + 700_000).alias("doc_id"), "text"
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(15).unionByName(dup)
    full = {
        r.doc_id: r
        for r in incremental_minhash_dedup(batch, store, store_exploded=True).collect()
    }
    probe = {
        r.doc_id: r
        for r in incremental_minhash_dedup(
            batch, store, store_exploded=True, probe_bands=[0]
        ).collect()
    }
    assert set(probe) == set(full)
    for d in full:
        assert probe[d].n_candidates <= full[d].n_candidates
        assert not probe[d].is_dup or full[d].is_dup  # probe ⊆ full
    # exact redelivered copies share every band, so even the 1-band
    # probe flags them
    assert all(probe[d].is_dup for d in probe if d >= 700_000)
