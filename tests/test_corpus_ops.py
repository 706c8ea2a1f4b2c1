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
