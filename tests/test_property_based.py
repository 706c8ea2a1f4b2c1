"""Property-based tests (hypothesis) — what the reference's test
suite lacks (SURVEY.md §5 'not present: randomized/property-based
testing'). Each property pins an operator's semantics against a
pure-Python model on arbitrary inputs, one Spark job per case batch
(examples are generated first, then evaluated in a single plan, so
the suite stays fast).
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from docker_etl_spark.functions.histograms import hist_sum_maps
from docker_etl_spark.operators.aggregates import ordered_limited_collect
from docker_etl_spark.operators.skew import upsert_by_key
from docker_etl_spark.operators.text_dedup import jaccard, word_shingles

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_words = st.text(alphabet="abcd", min_size=1, max_size=3)
_texts = st.lists(_words, min_size=0, max_size=12).map(" ".join)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=8), st.integers(2, 4))
def test_word_shingles_matches_python_model(spark, texts, n):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, t STRING")
    got = {
        r["i"]: set(r["s"])
        for r in df.select("i", word_shingles("t", n).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_shingles(t, n), (t, n)


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=2, max_size=2))
def test_jaccard_matches_python_sets(spark, texts):
    a, b = _py_shingles(texts[0]), _py_shingles(texts[1])
    if not a or not b:
        return
    expected = len(a & b) / len(a | b)
    df = spark.createDataFrame([(texts[0], texts[1])], "ta STRING, tb STRING")
    got = df.select(
        jaccard(word_shingles("ta"), word_shingles("tb")).alias("j")
    ).first()["j"]
    assert abs(got - expected) < 1e-12


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-5, 5)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 6),
)
def test_ordered_limited_collect_matches_python_sort(spark, rows, limit):
    """A5: per-key DESC-ordered value collection with a cap equals
    the python sort-slice model (unique sort key = (ord, idx))."""
    data = [(k, o, i, v) for i, (k, o, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k INT, o INT, idx INT, v INT")
    out = {
        r["k"]: list(r["values"])
        for r in ordered_limited_collect(
            df, ["k"], ["o", "idx"], "v", limit=limit, descending=True
        ).collect()
    }
    model: dict[int, list[int]] = {}
    for k, o, i, v in data:
        model.setdefault(k, []).append((o, i, v))
    for k, items in model.items():
        expect = [v for (_, _, v) in sorted(items, reverse=True)[:limit]]
        assert out[k] == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.dictionaries(st.integers(0, 5), st.integers(1, 9), max_size=4),
        min_size=1,
        max_size=6,
    )
)
def test_hist_sum_maps_matches_counter_sum(spark, hists):
    from collections import Counter

    expected = dict(sum((Counter(h) for h in hists), Counter()))
    df = spark.createDataFrame([(hists,)], "hs ARRAY<MAP<INT,BIGINT>>")
    got = df.select(hist_sum_maps(F.col("hs")).alias("h")).first()["h"] or {}
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 100)), max_size=10),
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 100)), max_size=10),
)
def test_upsert_by_key_matches_dict_update(spark, cur, upd):
    cur_d = {k: v for k, v in cur}          # last write wins, like a table
    upd_d = {k: v for k, v in upd}
    expected = {**cur_d, **upd_d}
    cur_df = spark.createDataFrame(list(cur_d.items()) or [(None, None)], "k INT, v INT").filter("k IS NOT NULL")
    upd_df = spark.createDataFrame(list(upd_d.items()) or [(None, None)], "k INT, v INT").filter("k IS NOT NULL")
    got = {r["k"]: r["v"] for r in upsert_by_key(cur_df, upd_df, ["k"]).collect()}
    assert got == expected


def test_decimal_sum_is_order_independent(spark):
    """The engine's exactness rule: decimal aggregation is identical
    across partition orders (doubles are not)."""
    import random

    vals = [Decimal(f"{random.Random(7).uniform(0, 1000):.2f}") for _ in range(500)]
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df1 = spark.createDataFrame(rows, "i INT, v DOUBLE").repartition(1)
    df32 = spark.createDataFrame(list(reversed(rows)), "i INT, v DOUBLE").repartition(32)
    s1 = df1.agg(F.sum(F.col("v").cast("decimal(12,2)"))).first()[0]
    s32 = df32.agg(F.sum(F.col("v").cast("decimal(12,2)"))).first()[0]
    assert s1 == s32 == sum(vals)


# -- replay round trip -------------------------------------------------------

_state_vals = st.sampled_from(["p", "q", "r", "s"])
_state_seqs = st.lists(
    st.fixed_dictionaries({"a": _state_vals, "b": _state_vals}),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(_state_seqs)
def test_replay_inverts_forward_diffs(spark, seq):
    """For ANY state sequence: derive forward diffs (changed fields
    only), seed with the final state, and replay_states must emit
    exactly state_{i-1} before each change — the fold is the exact
    inverse of applying diffs forward (metric_changes.py:186-314)."""
    from docker_etl_spark.operators.replay import replay_states

    hist_rows = []
    for i in range(1, len(seq)):
        ch = [
            (f, seq[i][f], seq[i - 1][f])
            for f in ("a", "b")
            if seq[i][f] != seq[i - 1][f]
        ]
        if ch:
            hist_rows.append((1, i, ch))
    current = spark.createDataFrame(
        [(1, seq[-1])], "number long, state map<string,string>"
    )
    if not hist_rows:
        return  # no changes: replay output is empty by contract
    hist = spark.createDataFrame(
        hist_rows,
        "number long, change_time long, "
        "changes array<struct<field_name string, added string, removed string>>",
    )
    out = replay_states(current, hist, time_type="bigint").collect()
    got = {r.change_time: dict(r.state_before) for r in out}
    want = {t: dict(seq[t - 1]) for _, t, _ in [(1, r[1], r[2]) for r in hist_rows]}
    assert got == want


# -- TOML schema parsing ----------------------------------------------------

_BQ_TYPES = {
    "STRING": "string",
    "INT64": "bigint",
    "FLOAT64": "double",
    "BOOL": "boolean",
    "DATE": "date",
    "DATETIME": "timestamp_ntz",
}
_modes = st.sampled_from(["NULLABLE", "REQUIRED", "REPEATED"])
_fnames = st.text(alphabet="abcdef_", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("_")
)
_leaf = st.tuples(st.sampled_from(sorted(_BQ_TYPES)), _modes)


@settings(**_SETTINGS)
@given(
    st.dictionaries(_fnames, _leaf, min_size=1, max_size=6),
    st.dictionaries(_fnames, _leaf, min_size=1, max_size=3),
)
def test_schema_from_toml_parses_arbitrary_declarations(flat, nested):
    """Any valid field declaration set (incl. a nested RECORD) parses
    to the StructType a pure-Python model predicts: type mapping,
    REQUIRED → non-nullable, REPEATED → array wrapper."""
    from docker_etl_spark.plans.projectdata import schema_from_toml

    lines = []
    for name, (t, mode) in flat.items():
        lines += [f"[{name}]", f'type = "{t}"', f'mode = "{mode}"']
    rec_name = "rec_" + next(iter(nested))
    lines += [f"[{rec_name}]", 'type = "RECORD"']
    for name, (t, mode) in nested.items():
        lines += [f"[{rec_name}.fields.{name}]", f'type = "{t}"', f'mode = "{mode}"']
    schema = schema_from_toml("\n".join(lines))

    got = {f.name: f for f in schema.fields}
    assert set(got) == set(flat) | {rec_name}
    for name, (t, mode) in flat.items():
        f = got[name]
        if mode == "REPEATED":
            assert f.dataType.typeName() == "array"
            assert f.dataType.elementType.simpleString() == _BQ_TYPES[t]
        else:
            assert f.dataType.simpleString() == _BQ_TYPES[t]
            assert f.nullable == (mode != "REQUIRED")
    sub = {f.name: f for f in got[rec_name].dataType.fields}
    assert set(sub) == set(nested)


# -- URL canonicalization ----------------------------------------------------

_hostchars = st.text(alphabet="aBcD0", min_size=1, max_size=6)
_seg = st.text(alphabet="xYz2", min_size=1, max_size=4)
_key = st.sampled_from(["a", "B", "k2", "utm_source", "utm_x", "fbclid", "gclid"])
_urlspec = st.tuples(
    st.sampled_from(["http", "HTTPS"]),
    _hostchars,
    st.lists(_seg, min_size=0, max_size=3),
    st.lists(st.tuples(_key, _seg), min_size=0, max_size=4),
    st.booleans(),  # fragment
)


def _py_canonical(scheme, host, segs, params, frag):
    kept = sorted(
        f"{k}={v}"
        for k, v in params
        if not (k.startswith("utm_") or k in ("fbclid", "gclid"))
    )
    path = "/" + "/".join(segs) if segs else ""
    q = ("?" + "&".join(kept)) if kept else ""
    return f"{scheme.lower()}://{host.lower()}{path}{q}"


@settings(**_SETTINGS)
@given(st.lists(_urlspec, min_size=1, max_size=6))
def test_canonicalize_url_matches_python_model(spark, specs):
    from docker_etl_spark.functions.scalars import canonicalize_url

    urls, want = [], []
    for scheme, host, segs, params, frag in specs:
        u = f"{scheme}://{host}"
        if segs:
            u += "/" + "/".join(segs)
        if params:
            u += "?" + "&".join(f"{k}={v}" for k, v in params)
        if frag:
            u += "#frag"
        urls.append(u)
        want.append(_py_canonical(scheme, host, segs, params, frag))
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == want


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.integers(1, 4),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, filter_type, seed):
    """Arbitrary uint8 arrays survive encode -> decode bit-exactly
    for every shape, channel count, and scanline filter (pure
    stdlib codec — no Spark session needed)."""
    import numpy as np

    from docker_etl_spark.operators import _png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    back = _png.decode_png(_png.encode_png(img, filter_type=filter_type))
    assert back.shape == (h, w, c)
    assert np.array_equal(back, img)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 199), st.integers(0, 1)),
        min_size=2,
        max_size=30,
    )
)
def test_psi_is_symmetric_under_snapshot_swap(spark, rows):
    """PSI's component (p-q)·ln(p/q) is invariant under swapping the
    two snapshots (both factors negate), so flipping every snapshot
    flag must reproduce the identical psi per group."""
    from docker_etl_spark.operators.profiling import psi_drift

    df = spark.createDataFrame(rows, "g string, v long, s int")
    flipped = df.withColumn("s", 1 - F.col("s"))
    a = {r["g"]: r["psi"] for r in psi_drift(df, "g", "v", "s", 20, 5).collect()}
    b = {r["g"]: r["psi"] for r in psi_drift(flipped, "g", "v", "s", 20, 5).collect()}
    assert a == b


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=6))
def test_cdc_chunks_reconstruct_their_document(spark, texts):
    """Joining a document's CDC chunks in order with single spaces
    reproduces exactly its non-empty-token sequence — chunking is a
    partition of the words, never dropping or duplicating any."""
    from docker_etl_spark.operators.corpus import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        rebuilt = " ".join(c for _, c in sorted(got.get(i, [])))
        assert rebuilt == " ".join(words), (t,)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=12,
    )
)
def test_leakage_safe_split_is_cluster_constant(spark, raw_pairs):
    """Under ANY near-dup pair graph, every member of a connected
    component draws the same split, and that split equals the naive
    draw of the component's min-id member."""
    from docker_etl_spark.operators.corpus import leakage_safe_split

    pairs = [(a, b) for a, b in raw_pairs if a != b]
    docs = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    pdf = spark.createDataFrame(
        pairs or [(0, 0)], "id_a long, id_b long"
    ).filter(F.col("id_a") != F.col("id_b"))
    got = {r["doc_id"]: r.asDict() for r in leakage_safe_split(docs, pdf).collect()}
    # python union-find model
    parent = list(range(16))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for i in range(16):
        rep = find(i)
        assert got[i]["rep_id"] == rep, (pairs, i)
        assert got[i]["split"] == got[rep]["split"]
        assert got[rep]["split"] == got[rep]["naive_split"]


def _py_ngrams(text: str, n: int) -> list[str]:
    w = text.split(" ")
    if len(w) < n:
        return []
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=8), st.integers(1, 4))
def test_ngram_array_matches_python_model_ordered(spark, texts, n):
    """ngram_array is ORDERED and keeps duplicates (unlike
    word_shingles): exact list equality against the Python model —
    pins the zip_with-over-shifted-slices construction, including
    short-doc empty branches and duplicate grams."""
    from docker_etl_spark.operators.corpus import doc_tokens, ngram_array

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i INT, t STRING"
    )
    got = {
        r["i"]: list(r["g"])
        for r in df.select(
            "i", ngram_array(doc_tokens("t"), n).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        # doc_tokens = lower + split(" "), KEEPING empty tokens
        # (split("", " ") is [""]), the engine-wide semantics every
        # oracle replays — the model must match it, not "clean" it.
        toks = t.lower().split(" ")
        expected = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ]
        assert got[i] == expected, (t, n, got[i], expected)


def _py_minhash_md5(text: str, n: int, num_perm: int) -> list:
    """Pure-Python model of the md5-mode MinHash signature: per
    permutation i, lexicographic min of md5(shingle || 'p{i}') hex
    over the distinct shingles (None when no shingles)."""
    import hashlib

    sh = _py_shingles(text, n)
    if not sh:
        return [None] * num_perm
    return [
        min(hashlib.md5((s + f"p{i}").encode()).hexdigest() for s in sh)
        for i in range(num_perm)
    ]


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=8), st.integers(1, 6))
def test_minhash_signature_matches_python_model(spark, texts, num_perm):
    """The round-7 fused aggregate fold must agree with the
    definitional per-permutation min on arbitrary corpora, including
    empty/short texts (all-NULL signatures)."""
    from docker_etl_spark.operators.text_dedup import minhash_signature

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i INT, t STRING"
    )
    got = {
        r["i"]: list(r["sig"])
        for r in df.select(
            "i",
            minhash_signature(word_shingles("t", 3), num_perm, "md5").alias(
                "sig"
            ),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_minhash_md5(t, 3, num_perm), (t, num_perm)


def _py_pmi(texts: list[str], min_count: int) -> dict[tuple[str, str], tuple[int, int]]:
    import math
    from collections import Counter

    pairs: Counter = Counter()
    for t in texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += 1
    n = sum(pairs.values())
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (a, b), c in pairs.items():
        c1[a] += c
        c2[b] += c
    out = {}
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        # the operator's exact formula: doubles cast before multiply,
        # one ln, round-half-away at 1e6
        ratio = (float(c) * float(n)) / (float(c1[a]) * float(c2[b]))
        import decimal

        q = decimal.Decimal(math.log(ratio) * 1_000_000).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
        out[(a, b)] = (c, int(q))
    return out


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=8), st.integers(1, 3))
def test_pmi_collocations_matches_python_model(spark, texts, min_count):
    from docker_etl_spark.operators.text_analysis import pmi_collocations

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi_scaled"])
        for r in pmi_collocations(df, min_count=min_count).collect()
    }
    assert got == _py_pmi([t.lower() for t in texts], min_count)
