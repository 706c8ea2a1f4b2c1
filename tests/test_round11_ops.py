"""Round-11 operator tests: the linear MinSpan sweep (term-stuffed
docs, >4-term queries), the term-dictionary sidecar, batch-probe
query barriers, snippet extraction, and store/streaming hardening."""

import pytest
from pyspark.sql import functions as F


def _positional_store(spark, tmp_path, rows, name="pstore"):
    from docker_etl_spark.operators.search import (
        build_positional_postings,
        write_search_index,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / name)
    p, s = build_positional_postings(df, "text", "doc_id")
    write_search_index(p, s, path, positional=True)
    return path


# ---------------------------------------------------------------------------
# Linear MinSpan sweep (r10 ADVICE: the cross-product envelope could
# plan Π min(tf_i, 128) structs — 268M for one term-stuffed doc at
# arity 4; the sweep is linear in total positions)
# ---------------------------------------------------------------------------


def test_proximity_term_stuffed_doc_is_linear(spark, tmp_path):
    """A doc carrying 4 query terms × 150 occurrences each would have
    planned min(150,128)^4 ≈ 2.7e8 envelope structs in ONE row under
    the r10 fold; the sweep handles it in O(600) merged positions.
    Interleaved layout makes the true min span 4 (one adjacent run of
    all four terms at the end)."""
    from docker_etl_spark.operators.search import proximity_search_topk

    # 150 rounds of "aaa pad pad bbb pad pad ccc pad pad ddd pad pad"
    # -> each term 150x, spread out; then one tight "aaa bbb ccc ddd"
    body = "aaa pad pad bbb pad pad ccc pad pad ddd pad pad " * 149
    text = body + "aaa bbb ccc ddd"
    rows = [(1, text), (2, "aaa bbb pad ccc only three terms")]
    path = _positional_store(spark, tmp_path, rows, "stuffed")
    out = proximity_search_topk(
        spark, path, ("aaa", "bbb", "ccc", "ddd"), slop=0, k=5,
        max_positions_per_term=4096,
    ).collect()
    assert [(r["doc_id"], r["min_span"]) for r in out] == [(1, 4)]


def test_proximity_five_plus_terms(spark, tmp_path):
    """Arity above 4 was rejected by the r10 guard (the product was
    exponential); the sweep lifts it. Brute-force agreement on a
    6-term query."""
    import itertools

    from docker_etl_spark.operators.search import proximity_search_topk

    docs = {
        1: "one two three four five six",
        2: "six pad one pad two pad three pad four pad five",
        3: "one two three four five pad pad pad pad pad six",
        4: "one two three four five",  # six absent
    }
    rows = list(docs.items())
    path = _positional_store(spark, tmp_path, rows, "six")
    terms = ("one", "two", "three", "four", "five", "six")

    def brute(ws):
        pls = [
            [i + 1 for i, w in enumerate(ws) if w == t] for t in terms
        ]
        if any(not pl for pl in pls):
            return None
        return min(
            max(c) - min(c) + 1 for c in itertools.product(*pls)
        )

    got = {
        r["doc_id"]: r["min_span"]
        for r in proximity_search_topk(
            spark, path, terms, slop=20, k=10
        ).collect()
    }
    want = {}
    for i, text in docs.items():
        sp = brute(text.split(" "))
        if sp is not None and sp <= len(terms) + 20:
            want[i] = sp
    assert got == want and 1 in got


def test_proximity_batch_five_terms_and_stuffed(spark, tmp_path):
    """Batch path rides the same sweep: a 5-term query and a stuffed
    doc in one call."""
    from docker_etl_spark.operators.search import (
        proximity_search_topk_batch,
    )

    stuffed = "aaa bbb ccc " * 200 + "ddd eee aaa bbb ccc"
    rows = [(1, stuffed), (2, "aaa zzz bbb zzz ccc")]
    path = _positional_store(spark, tmp_path, rows, "batch5")
    q = spark.createDataFrame(
        [
            (10, ["aaa", "bbb", "ccc", "ddd", "eee"], 0),
            (11, ["aaa", "ccc"], 1),
        ],
        "query_id long, terms array<string>, slop int",
    )
    out = proximity_search_topk_batch(
        q, path, slop_col="slop", k=5, max_positions_per_term=4096
    ).collect()
    got = {(r["query_id"], r["doc_id"]): r["min_span"] for r in out}
    # q10: only doc 1 has all five; tight run "ddd eee aaa bbb ccc"
    # -> span 5. q11: doc1 span 2 (ccc adjacent to the next aaa in
    # the repeating body); doc2 span 5 fails slop=1.
    assert got == {(10, 1): 5, (11, 1): 2}

# ---------------------------------------------------------------------------
# Batch probes materialize the caller's query frame exactly once
# (r10 ADVICE: the guard count / validation / term collect were
# separate actions re-executing a derived queries plan)
# ---------------------------------------------------------------------------


def test_batch_probes_evaluate_query_frame_once(spark, tmp_path):
    from docker_etl_spark.operators.search import (
        phrase_search_topk_batch,
        proximity_search_topk_batch,
        search_bm25_topk_batch,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "gamma alpha beta words"),
    ]
    path = _positional_store(spark, tmp_path, rows, "once")

    def run(probe, data, schema):
        acc = spark.sparkContext.accumulator(0)

        def tag(row):
            acc.add(1)
            return row

        rdd = spark.sparkContext.parallelize(data, 2).map(tag)
        q = spark.createDataFrame(rdd, schema)
        probe(q, path, k=5).collect()
        assert acc.value == len(data), probe.__name__

    run(
        search_bm25_topk_batch,
        [(1, ["alpha", "beta"]), (2, ["gamma"])],
        "query_id long, terms array<string>",
    )
    run(
        phrase_search_topk_batch,
        [(1, ["alpha", "beta"]), (2, ["gamma", "alpha"])],
        "query_id long, phrase array<string>",
    )
    run(
        proximity_search_topk_batch,
        [(1, ["alpha", "beta"]), (2, ["gamma", "alpha"])],
        "query_id long, terms array<string>",
    )


# ---------------------------------------------------------------------------
# parquet_write_completed: a _SUCCESS marker alone is not a completed
# write (r10 ADVICE — marker-only dirs fail schema inference)
# ---------------------------------------------------------------------------


def test_parquet_write_completed_rejects_marker_only_dir(spark, tmp_path):
    from docker_etl_spark.sources.stores import parquet_write_completed

    marker_only = tmp_path / "marker_only"
    marker_only.mkdir()
    (marker_only / "_SUCCESS").touch()
    assert not parquet_write_completed(spark, str(marker_only))
    # adding one committed data file flips it
    (marker_only / "part-00000.parquet").write_bytes(b"PAR1")
    assert parquet_write_completed(spark, str(marker_only))


# ---------------------------------------------------------------------------
# search_index_stream: skipping a redelivered below-horizon batch now
# VERIFIES the batch's rows are in the store (r10 ADVICE — an
# out-of-band compaction past an undelivered batch was silent loss)
# ---------------------------------------------------------------------------


def test_search_index_stream_raises_on_never_appended_folded_batch(
    spark, tmp_path
):
    from docker_etl_spark.operators.search import (
        build_postings,
        compact_search_index,
        write_search_index,
    )
    from docker_etl_spark.streaming import search_index_stream

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta words")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "oob")
    p, s = build_postings(docs, "text", "doc_id")
    write_search_index(p, s, store, batch_id=0)
    # operator error: compaction horizon advanced past batch 5, which
    # the stream never delivered
    compact_search_index(spark, store, up_to_batch=5)
    fresh = spark.createDataFrame(
        [(10, "never ingested document")], "doc_id long, text string"
    )
    sink = search_index_stream(store)
    with pytest.raises(ValueError, match="NOT in the store"):
        sink(fresh, 3)
    # a batch whose docs ARE present (true redelivery) still skips
    sink(docs, 2)  # no raise; ids 1,2 verified present
    # an all-unindexable batch has nothing to verify -> safe skip
    sink(
        spark.createDataFrame([(99, "a b c")], "doc_id long, text string"),
        1,
    )
