"""Unit tests for operators/corpus.py — edge cases the fixture-based
differential suite can't exercise (oversized packs, exact fits,
crafted repetition, PII patterns)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from docker_etl_spark.operators.corpus import (
    contamination_check,
    gopher_quality,
    ngram_array,
    pack_sequences,
    passage_dup_stats,
    pii_features,
    repetition_features,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_crafted(spark):
    # "a b a b a" → bigrams [a b, b a, a b, b a] → distinct 2 → dup 0.5;
    # top token a: 3/5; top bigram: 2/4.
    df = spark.createDataFrame([Row(text="a b a b a")])
    feats = repetition_features(F.col("text"))
    r = _one(df.select(*[c.alias(n) for n, c in feats.items()]))
    assert r.n_tokens == 5
    assert r.dup_2gram_frac == pytest.approx(0.5)
    assert r.top_token_frac == pytest.approx(3 / 5)
    assert r.top_2gram_frac == pytest.approx(2 / 4)


def test_repetition_no_repeats(spark):
    df = spark.createDataFrame([Row(text="w x y z")])
    feats = repetition_features(F.col("text"))
    r = _one(df.select(*[c.alias(n) for n, c in feats.items()]))
    assert r.dup_2gram_frac == 0.0
    assert r.dup_3gram_frac == 0.0
    assert r.top_token_frac == pytest.approx(0.25)


def test_ngram_short_doc_empty(spark):
    df = spark.createDataFrame([Row(text="solo")])
    r = _one(
        df.select(
            F.size(ngram_array(F.split("text", " "), 3)).alias("n")
        )
    )
    assert r.n == 0


# ---------------------------------------------------------------------------
# quality gate
# ---------------------------------------------------------------------------


def test_gopher_quality_short_doc_rejected(spark):
    df = spark.createDataFrame([Row(text="the a of tiny doc")])
    feats = gopher_quality(F.col("text"))
    r = _one(df.select(*[c.alias(n) for n, c in feats.items()]))
    assert r.n_words == 5
    assert not r.ok_word_count
    assert r.ok_stopwords  # 'the','a','of' present
    assert not r.keep


def test_gopher_quality_good_doc(spark):
    text = " ".join(["the", "a"] + ["word"] * 30)
    df = spark.createDataFrame([Row(text=text)])
    feats = gopher_quality(F.col("text"))
    r = _one(df.select(*[c.alias(n) for n, c in feats.items()]))
    assert r.keep


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _pack(spark, rows, budget):
    df = spark.createDataFrame(
        [Row(grp="g", doc_id=i, tok=t) for i, t in rows]
    )
    out = pack_sequences(df, budget=budget)
    return {r.doc_id: r.pack_id for r in out.collect()}


def test_pack_greedy_boundaries(spark):
    # budget 10: [4,4,4] → packs [0,0,1] (third would hit 12).
    assert _pack(spark, [(1, 4), (2, 4), (3, 4)], 10) == {1: 0, 2: 0, 3: 1}


def test_pack_exact_fit(spark):
    # 6+4 == 10 exactly fits; next opens new pack.
    assert _pack(spark, [(1, 6), (2, 4), (3, 1)], 10) == {1: 0, 2: 0, 3: 1}


def test_pack_oversized_doc_isolated(spark):
    # doc 2 (tok 25 > budget) sits alone; doc 3 starts fresh after it.
    assert _pack(spark, [(1, 3), (2, 25), (3, 3), (4, 3)], 10) == {
        1: 0,
        2: 1,
        3: 2,
        4: 2,
    }


def test_pack_oversized_first(spark):
    assert _pack(spark, [(1, 99), (2, 5)], 10) == {1: 0, 2: 1}


def test_pack_groups_independent(spark):
    df = spark.createDataFrame(
        [
            Row(grp="g1", doc_id=1, tok=8),
            Row(grp="g1", doc_id=2, tok=8),
            Row(grp="g2", doc_id=3, tok=8),
        ]
    )
    out = {
        (r.grp, r.doc_id): r.pack_id
        for r in pack_sequences(df, budget=10).collect()
    }
    assert out == {("g1", 1): 0, ("g1", 2): 1, ("g2", 3): 0}


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_exact_copy_and_clean(spark):
    bench = spark.createDataFrame([Row(doc_id=100, text="p q r s t")])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="p q r s t"),  # exact copy → frac 1.0
            Row(doc_id=2, text="u v w x y z"),  # disjoint → frac 0.0
        ]
    )
    out = {
        r.doc_id: r for r in contamination_check(docs, bench, n=3).collect()
    }
    assert out[1].contamination_frac == pytest.approx(1.0)
    assert out[2].n_contaminated == 0
    assert out[2].contamination_frac == 0.0


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_redaction_all_classes(spark):
    t = "mail bob@site.org call +1 555-0100 from 10.0.0.1 end"
    df = spark.createDataFrame([Row(t=t)])
    feats = pii_features(F.col("t"))
    r = _one(df.select(*[c.alias(n) for n, c in feats.items()]))
    assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1)
    assert r.clean_text == "mail <EMAIL> call <PHONE> from <IP> end"


def test_pii_clean_text_unchanged(spark):
    df = spark.createDataFrame([Row(t="no pii here at all")])
    feats = pii_features(F.col("t"))
    r = _one(df.select(*[c.alias(n) for n, c in feats.items()]))
    assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 0)
    assert r.clean_text == "no pii here at all"


# ---------------------------------------------------------------------------
# passage dedup
# ---------------------------------------------------------------------------


def test_passage_dup_shared_prefix(spark):
    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " unique tail one two"),
            Row(doc_id=2, text=shared + " other ending here"),
            Row(doc_id=3, text="completely different words entirely"),
        ]
    )
    out = {
        r.doc_id: r for r in passage_dup_stats(docs, chunk_tokens=10).collect()
    }
    # docs 1 and 2 share their first 10-token chunk; tails are unique.
    assert out[1].n_chunks == 2 and out[1].n_dup_chunks == 1
    assert out[2].dup_chunk_frac == pytest.approx(0.5)
    assert out[3].n_dup_chunks == 0


def test_strip_boilerplate_rewrites_docs(spark):
    from docker_etl_spark.operators.corpus import strip_boilerplate

    shared = " ".join(f"w{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " unique tail one two"),
            Row(doc_id=2, text=shared + " other ending here now"),
            Row(doc_id=3, text=shared),  # fully boilerplate
            Row(doc_id=4, text="completely different words entirely x"),
        ]
    )
    out = {
        r.doc_id: r
        for r in strip_boilerplate(docs, chunk_tokens=5, min_docs=2).collect()
    }
    assert len(out) == 4  # fully-removed docs still present
    assert out[1].clean_text == "unique tail one two"
    assert out[1].n_chunks == 2 and out[1].n_removed == 1
    assert out[2].clean_text == "other ending here now"
    assert out[3].clean_text == "" and out[3].removed_frac == 1.0
    # unique doc passes through untouched (lowercased tokenizer)
    assert out[4].clean_text == "completely different words entirely x"
    assert out[4].n_removed == 0


def test_strip_boilerplate_preserves_chunk_order(spark):
    from docker_etl_spark.operators.corpus import strip_boilerplate

    bp = "a b c d e"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="p q r s t " + bp + " u v w x y"),
            Row(doc_id=2, text=bp + " z z z z z"),
        ]
    )
    out = {
        r.doc_id: r
        for r in strip_boilerplate(docs, chunk_tokens=5, min_docs=2).collect()
    }
    # middle chunk removed, flanks rejoined in original order
    assert out[1].clean_text == "p q r s t u v w x y"
    assert out[2].clean_text == "z z z z z"


def test_source_overlap_matrix(spark):
    from docker_etl_spark.operators.corpus import source_overlap

    shared = " ".join(f"w{i}" for i in range(5))
    other = " ".join(f"v{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text=shared + " " + other),
            Row(doc_id=2, source="b", text=shared + " z z z z z"),
            Row(doc_id=3, source="c", text="q q q q q r r r r r"),
        ]
    )
    out = {
        (r.group_a, r.group_b): r
        for r in source_overlap(docs, chunk_tokens=5).collect()
    }
    # a and b share exactly the boilerplate chunk; c overlaps nobody
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r.n_shared == 1 and r.n_a == 2 and r.n_b == 2
    assert r.frac_a == 0.5 and r.frac_b == 0.5


def test_token_budget_cap_invariants(spark):
    from docker_etl_spark.operators.corpus import token_budget_cap

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, domain=f"d{i % 2}", text=" ".join(["w"] * (10 + i)))
            for i in range(12)
        ]
    )
    out = token_budget_cap(docs, "domain", budget=40).collect()
    assert out and set(docs.columns) == set(out[0].asDict())
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, 0)
        by_dom[r.domain] += len(r.text.split(" "))
    # never exceeds the budget, and the admitted set is non-trivial
    assert all(v <= 40 for v in by_dom.values())
    assert all(v >= 10 for v in by_dom.values())
    # deterministic across invocations
    again = token_budget_cap(docs, "domain", budget=40).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


# ---------------------------------------------------------------------------
# as-of join (operators/joins.py — tested here to avoid a new module)
# ---------------------------------------------------------------------------


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [Row(k="a", lts=10, tag="L1"), Row(k="a", lts=20, tag="L2"),
         Row(k="a", lts=5, tag="L0"), Row(k="b", lts=10, tag="L3")]
    )
    right = spark.createDataFrame(
        [Row(k="a", rts=10, payload="P10"), Row(k="a", rts=15, payload="P15"),
         Row(k="c", rts=1, payload="PX")]
    )
    return left, right


def test_asof_join_inclusive(spark):
    from docker_etl_spark.operators.joins import asof_join

    left, right = _asof_fixture(spark)
    out = {
        r.tag: r.payload
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["payload"]
        ).collect()
    }
    # L0 (t=5): no purchase yet; L1 (t=10): same-instant match P10;
    # L2 (t=20): latest is P15; L3 key b: no right rows at all.
    assert out == {"L0": None, "L1": "P10", "L2": "P15", "L3": None}


def test_asof_join_strict(spark):
    from docker_etl_spark.operators.joins import asof_join

    left, right = _asof_fixture(spark)
    out = {
        r.tag: r.payload
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["payload"], strict=True
        ).collect()
    }
    # strict: L1 (t=10) must NOT see the same-instant P10.
    assert out == {"L0": None, "L1": None, "L2": "P15", "L3": None}


def test_asof_join_shared_column_names(spark):
    from docker_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame([Row(k="a", ts=10, value=1.0)])
    right = spark.createDataFrame([Row(k="a", ts=8, value=99.0)])
    r = asof_join(
        left,
        right.withColumnRenamed("value", "rvalue"),
        ["k"],
        "ts",
        "ts",
        ["rvalue"],
    ).collect()[0]
    assert (r.value, r.rvalue) == (1.0, 99.0)


# ---------------------------------------------------------------------------
# connected components (operators/dedupe.py)
# ---------------------------------------------------------------------------


def test_connected_components_chain_and_islands(spark):
    """A 4-node chain (diameter 3 — needs >1 propagation round), a
    2-node pair, and an unlisted singleton (absent from output)."""
    from docker_etl_spark.operators.dedupe import connected_components

    pairs = spark.createDataFrame(
        [
            Row(id_a=4, id_b=3),
            Row(id_a=3, id_b=2),
            Row(id_a=2, id_b=1),  # chain 1-2-3-4
            Row(id_a=10, id_b=11),
        ]
    )
    got = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_merging_clusters(spark):
    """Two clusters bridged by one edge collapse to one component."""
    from docker_etl_spark.operators.dedupe import connected_components

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=5, id_b=6), Row(id_a=2, id_b=6)]
    )
    got = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 5: 1, 6: 1}


# ---------------------------------------------------------------------------
# mixture sampling (operators/corpus.py)
# ---------------------------------------------------------------------------


def test_mixture_sample_rates_and_determinism(spark):
    from docker_etl_spark.operators.corpus import mixture_sample

    rows = [Row(doc_id=i, source="a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = mixture_sample(
        df, "source", {"a": 1.0, "b": 0.25}, key_cols=("doc_id",)
    )
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert counts["a"] == 1000  # rate 1.0 keeps everything
    assert 150 < counts.get("b", 0) < 350  # ~250 expected
    # deterministic: second run selects the identical rows
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in mixture_sample(
        df, "source", {"a": 1.0, "b": 0.25}, key_cols=("doc_id",)).collect())
    assert ids1 == ids2
    # unknown domain drops by default
    df2 = spark.createDataFrame([Row(doc_id=1, source="zzz")])
    assert mixture_sample(df2, "source", {"a": 1.0}).count() == 0
    # ...and default_rate=1.0 keeps it
    assert mixture_sample(
        df2, "source", {"a": 0.5}, default_rate=1.0).count() == 1


def test_mixture_sample_partition_invariant(spark):
    """The sample is a pure per-row function of the key — identical
    membership at any partitioning (the retry/resume guarantee)."""
    from docker_etl_spark.operators.corpus import mixture_sample

    rows = [Row(doc_id=i, source="w") for i in range(500)]
    a = spark.createDataFrame(rows).repartition(1)
    b = spark.createDataFrame(rows).repartition(13)
    ids_a = sorted(r.doc_id for r in mixture_sample(a, "source", {"w": 0.3}).collect())
    ids_b = sorted(r.doc_id for r in mixture_sample(b, "source", {"w": 0.3}).collect())
    assert ids_a == ids_b


# ---------------------------------------------------------------------------
# batch sessionization (operators/windows.py)
# ---------------------------------------------------------------------------


def test_sessionize_gap_split(spark):
    import datetime as dt
    from docker_etl_spark.operators.windows import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(user_id=1, event_id=1, ts=t0),
        Row(user_id=1, event_id=2, ts=t0 + dt.timedelta(seconds=100)),
        # gap of exactly 1800s -> same session (> threshold splits)
        Row(user_id=1, event_id=3, ts=t0 + dt.timedelta(seconds=1900)),
        # gap 1801s -> NEW session
        Row(user_id=1, event_id=4, ts=t0 + dt.timedelta(seconds=3701)),
        Row(user_id=2, event_id=5, ts=t0),
    ]
    out = sessionize(
        spark.createDataFrame(rows), ["user_id"], "ts", 1800,
        order_tiebreak=["event_id"],
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_idx)
    assert [r.n_events for r in u1] == [3, 1]
    assert u1[0].duration_seconds == 1900
    assert len(by_user[2]) == 1 and by_user[2][0].n_events == 1


# ---------------------------------------------------------------------------
# int8 quantization + kmeans (operators/similarity.py)
# ---------------------------------------------------------------------------


def test_quantize_vectors_int8_bounds(spark):
    from docker_etl_spark.operators.similarity import quantize_vectors_int8

    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, -0.5, 0.25]),
            Row(vec_id=2, embedding=[0.0, 0.0, 0.0]),
        ]
    )
    got = {r.vec_id: r for r in quantize_vectors_int8(df).collect()}
    assert got[1].q == [127, -64, 31]  # floor semantics
    assert abs(got[1].q_scale - 1.0 / 127) < 1e-12
    assert got[2].q == [0, 0, 0] and got[2].q_scale is None
    assert all(-127 <= x <= 127 for x in got[1].q)


def test_kmeans_separates_obvious_clusters(spark):
    from docker_etl_spark.operators.similarity import kmeans_fit_quantized

    rows = [
        Row(vec_id=i, embedding=[10.0 + 0.01 * i, 10.0]) for i in range(5)
    ] + [
        Row(vec_id=100 + i, embedding=[-10.0 - 0.01 * i, -10.0])
        for i in range(5)
    ]
    out = kmeans_fit_quantized(
        spark.createDataFrame(rows), "embedding", "vec_id", k=2, iterations=2
    ).collect()
    sizes = sorted(r.n_members for r in out)
    assert sizes == [5, 5]
    # membership checksum separates the two blobs exactly
    sums = sorted(r.member_id_sum for r in out)
    assert sums == [sum(range(5)), sum(range(100, 105))]


# ---------------------------------------------------------------------------
# tf-idf top terms (operators/text_analysis.py)
# ---------------------------------------------------------------------------


def test_tfidf_rare_term_beats_common_on_tie(spark):
    from docker_etl_spark.operators.text_analysis import tfidf_top_terms

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple zebra zebra common"),
            Row(doc_id=2, text="common apple banana banana banana"),
        ]
    )
    out = tfidf_top_terms(df, k=2)
    top1 = {r.rank: r.term for r in out.filter(F.col("doc_id") == 1).collect()}
    # tf ties at 2 for apple & zebra; zebra is rarer (df 1 vs 2) -> wins
    assert top1[1] == "zebra"
    assert top1[2] == "apple"


def test_hash_split_partitions_exactly_and_deterministically(spark):
    from docker_etl_spark.operators.corpus import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, key_cols=("doc_id",))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # Every row lands in exactly one split; fractions approximately hold.
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1600
    assert counts["val"] < 250 and counts["test"] < 250
    # Deterministic: same assignment on recompute and under repartition.
    again = hash_split(df.repartition(7), key_cols=("doc_id",))
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted((r["doc_id"], r["split"]) for r in again.collect())
    assert a == b


def test_hash_split_rejects_single_split(spark):
    from docker_etl_spark.operators.corpus import hash_split

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, fractions=(("all", 1.0),))


def test_domain_cap_caps_only_over_cap_domains(spark):
    from docker_etl_spark.operators.corpus import domain_cap

    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap(df, "source", 10)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "small": 5}
    # Survivors are a deterministic subset, stable across reruns.
    k1 = sorted(r["doc_id"] for r in out.filter("source = 'big'").collect())
    k2 = sorted(r["doc_id"] for r in
                domain_cap(df.repartition(5), "source", 10)
                .filter("source = 'big'").collect())
    assert k1 == k2 and len(k1) == 10


def test_chunk_windows_coverage_and_no_redundant_tail(spark):
    from docker_etl_spark.operators.corpus import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(8))),    # len == window
            (2, " ".join(f"t{i}" for i in range(12))),   # tail inside overlap
            (3, " ".join(f"t{i}" for i in range(13))),   # tail contributes
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = chunk_windows(docs, window=8, overlap=4)
    chunks = {}
    for r in out.collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    # Short docs -> exactly one full-coverage chunk.
    assert [c["n_tokens"] for c in chunks[1]] == [8] and len(chunks[1]) == 1
    assert len(chunks[4]) == 1 and chunks[4][0]["chunk_text"] == "solo"
    # len=12, stride=4: starts 1,5 only (9 would add nothing new).
    assert sorted(c["start_tok"] for c in chunks[2]) == [1, 5]
    # len=13: start 9 now contributes token 13.
    assert sorted(c["start_tok"] for c in chunks[3]) == [1, 5, 9]
    # Every token of doc 3 is covered by the union of its chunks.
    covered = set()
    for c in chunks[3]:
        covered |= set(range(c["start_tok"], c["start_tok"] + c["n_tokens"]))
    assert covered == set(range(1, 14))
    # chunk_id is the dense stride index.
    assert all(c["chunk_id"] == (c["start_tok"] - 1) // 4 for c in chunks[3])


def test_chunk_windows_rejects_bad_overlap(spark):
    from docker_etl_spark.operators.corpus import chunk_windows

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, window=8, overlap=8)


def test_incremental_content_dedup_drops_seen_and_batch_dups(spark):
    from docker_etl_spark.operators.dedupe import incremental_content_dedup

    store = spark.createDataFrame(
        [(1, "old content"), (2, "shared content")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "shared content"),   # already in store -> dropped
            (11, "fresh content"),    # new -> kept
            (12, "fresh content"),    # intra-batch dup -> dropped (11 wins)
            (13, "another fresh"),    # new -> kept
        ],
        "doc_id long, text string",
    )
    out = incremental_content_dedup(batch, store)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [11, 13]
    # Survivors carry the digest for the store append.
    assert "content_md5" in out.columns
    # Store with a precomputed digest column short-circuits hashing.
    pre = store.select("doc_id", "text").withColumn("content_md5", F.md5("text"))
    kept2 = sorted(r["doc_id"] for r in incremental_content_dedup(batch, pre).collect())
    assert kept2 == [11, 13]


def test_keep_best_per_cluster_prefers_quality_then_id(spark):
    from docker_etl_spark.operators.dedupe import keep_best_per_cluster

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9), (10, 9)], "node long, component long"
    )
    quality = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (9, 10), (10, 10)], "node long, n_chars long"
    )
    out = {r["cluster_id"]: r for r in
           keep_best_per_cluster(labels, quality, "n_chars").collect()}
    # Cluster 1: nodes 2 and 3 tie on quality 90 -> lower id wins.
    assert out[1]["keep_id"] == 2 and out[1]["keep_quality"] == 90
    assert out[1]["n_members"] == 3
    # Cluster 9: tie at 10 -> node 9.
    assert out[9]["keep_id"] == 9 and out[9]["n_members"] == 2
