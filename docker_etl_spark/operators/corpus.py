"""Training-corpus pipeline operators: quality filtering, packing,
contamination checks, PII redaction, passage-level dedup.

These are the corpus-preparation stages a large-scale LLM training
pipeline runs between raw crawl and tokenizer — the natural
extension of the reference's text/ETL surface (SURVEY.md §2.8 string
families; jobs/webcompat-kb text normalization) to the 100 TB
training-data setting. Everything here is pure JVM Column
expressions (HOF folds, regexp, hash-groupBy) — no Python stage, so
plans stay inside WholeStageCodegen and scale by partitioning:

- per-document features (repetition, quality flags, PII) are
  embarrassingly parallel map expressions;
- corpus-wide stages (packing, contamination, passage dedup) shuffle
  once on a bounded key (group / n-gram / chunk-hash), never all-pairs.

Cross-engine exactness: every emitted double is a single IEEE
division of two exact integers, so DuckDB oracles hash-match.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared token helpers
# ---------------------------------------------------------------------------


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def doc_tokens(text: Column | str) -> Column:
    """Whitespace tokens, lowercased (the corpus-ops tokenizer)."""
    return F.split(F.lower(_col(text)), " ")


def ngram_array(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty if < n
    tokens).

    Built as a zip_with chain over ``n`` shifted slices: every
    reference to ``toks`` is a top-level expression (evaluated ~n+2
    times per row), so callers may pass a raw expression (e.g.
    ``doc_tokens(text)``) without quadratic blowup. The
    transform-over-index shape with ``element_at(toks, i+k)`` in the
    lambda re-evaluates ``toks`` once per gram PER POSITION —
    interpreted HOF lambdas re-evaluate embedded subexpressions
    (no CSE) — i.e. O(n_tokens^2) tokenization per document."""
    if n == 1:
        return toks
    m = F.size(toks) - n + 1
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    # sequence/slice with a non-positive length would misbehave on
    # short docs — keep the explicit empty branch.
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.expr("cast(array() as array<string>)")
    )


# ---------------------------------------------------------------------------
# repetition features (Gopher-style duplicate-text fractions)
# ---------------------------------------------------------------------------


def duplicate_fraction(arr: Column) -> Column:
    """Fraction of array elements that are repeats of an earlier
    element: 1 - |distinct|/|all|. Null for empty arrays. One IEEE
    division of two exact ints — engine-portable."""
    n = F.size(arr)
    return F.when(
        n > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(arr)).cast("double") / n.cast("double"),
    )


def max_frequency(arr: Column) -> Column:
    """Count of the most frequent element — computed as the longest
    equal-run in the sorted array via a single fold (no shuffle, no
    map-building; ASCII token sort order is engine-identical)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        newrun = (
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.greatest(acc["best"], newrun).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), init, merge, lambda acc: acc["best"])


def top_fraction(arr: Column) -> Column:
    """Fraction of elements taken by the single most frequent one."""
    n = F.size(arr)
    return F.when(n > 0, max_frequency(arr).cast("double") / n.cast("double"))


def repetition_features(text: Column | str) -> dict[str, Column]:
    """Gopher-style repetition metrics of one document.

    Returns named Columns: ``n_tokens``, ``dup_2gram_frac``,
    ``dup_3gram_frac`` (fraction of n-grams that repeat an earlier
    one), ``top_token_frac``, ``top_2gram_frac`` (mass of the most
    frequent token / bigram). High values flag boilerplate and
    machine-generated spam; the published filters threshold these
    (e.g. drop if dup_2gram_frac > 0.2)."""
    toks = doc_tokens(text)
    g2 = ngram_array(toks, 2)
    g3 = ngram_array(toks, 3)
    return {
        "n_tokens": F.size(toks).cast("long"),
        "dup_2gram_frac": duplicate_fraction(g2),
        "dup_3gram_frac": duplicate_fraction(g3),
        "top_token_frac": top_fraction(toks),
        "top_2gram_frac": top_fraction(g2),
    }


# ---------------------------------------------------------------------------
# Gopher-ish quality gate
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")


def gopher_quality(
    text: Column | str,
    *,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """Document-level quality gate in the style of the published
    Gopher rules: word-count band, mean-word-length band, fraction of
    purely-alphabetic words, and minimum stopword evidence. Returns
    the measured features, one boolean per rule, and ``keep`` (the
    conjunction). Pure expressions — runs as a map over the scan."""
    toks = doc_tokens(text)
    n_words = F.size(toks).cast("long")
    total_len = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t).cast("long"),
    )
    mean_len = F.when(
        n_words > 0, total_len.cast("double") / n_words.cast("double")
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast(
        "long"
    )
    alpha_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words.cast("double")
    )
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS))
    ).cast("long")
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    ok_alpha = alpha_frac >= min_alpha_frac
    ok_stop = n_stop >= min_stopwords
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "alpha_frac": alpha_frac,
        "n_stopwords": n_stop,
        "ok_word_count": ok_words,
        "ok_mean_word_len": ok_mean,
        "ok_alpha_frac": ok_alpha,
        "ok_stopwords": ok_stop,
        "keep": ok_words & ok_mean & ok_alpha & ok_stop,
    }


# ---------------------------------------------------------------------------
# greedy sequence packing (context-window bin packing)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "tok",
    group_col: str = "grp",
) -> DataFrame:
    """Greedy first-fit-in-order packing of documents into
    fixed-token-budget context windows (LLM pretraining sequence
    packing). Within each group, documents are taken in ``id_col``
    order; a document that would overflow the current pack opens the
    next one; an oversized document (> budget) occupies a pack alone.

    Output: (group, id, tok, pack_id) with pack ids dense from 0 per
    group. Deterministic — the same greedy fold is reproducible in
    any engine (the oracle replays it as a recursive CTE).

    Scale: one shuffle on ``group_col``; the per-group fold is a
    collect_list + aggregate expression, so group size must be
    bounded. At 100 TB, pack per (group, shard) — e.g. shard =
    pmod(xxhash64(id), k) — which keeps every group in memory and
    adds no cross-shard coupling (packing is per-shard greedy by
    construction)."""
    items = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), F.col(token_col)))
    )
    init = F.struct(
        F.expr("cast(array() as array<bigint>)").alias("packs"),
        F.lit(0).cast("bigint").alias("cur"),
        F.lit(0).cast("bigint").alias("used"),
    )

    def merge(acc: Column, x: Column) -> Column:
        overflow = (acc["used"] + x[token_col] > F.lit(budget)) & (
            acc["used"] > 0
        )
        newcur = F.when(overflow, acc["cur"] + 1).otherwise(acc["cur"])
        newused = F.when(overflow, x[token_col].cast("bigint")).otherwise(
            acc["used"] + x[token_col]
        )
        return F.struct(
            F.concat(acc["packs"], F.array(newcur)).alias("packs"),
            newcur.alias("cur"),
            newused.alias("used"),
        )

    packed = (
        df.groupBy(group_col)
        .agg(items.alias("items"))
        .select(
            group_col,
            F.explode(
                F.arrays_zip(
                    F.col("items"),
                    F.aggregate(
                        F.col("items"), init, merge, lambda acc: acc["packs"]
                    ).alias("pack_id"),
                )
            ).alias("z"),
        )
    )
    return packed.select(
        F.col(group_col),
        F.col(f"z.items.{id_col}").alias(id_col),
        F.col(f"z.items.{token_col}").alias(token_col),
        F.col("z.pack_id").alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# benchmark-contamination check
# ---------------------------------------------------------------------------


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of a
    document's distinct word n-grams that also occur anywhere in the
    benchmark set (the published eval-decontamination test, usually
    run with 13-grams at web scale).

    The benchmark n-gram set is distinct-ed and broadcast — the
    corpus side is ONE pass: a single explode (outer, so empty docs
    keep a row), a broadcast left join marking benchmark hits, and
    one groupBy on ``id_col`` computing total and contaminated
    shingle counts together. 100 TB of documents stream through with
    no corpus-side wide shuffle on n-grams and the n-gram expression
    evaluated exactly once per document."""
    d_sh = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(ngram_array(doc_tokens(text_col), n))
        ).alias("sh"),
    )
    b_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(ngram_array(doc_tokens(text_col), n))
            ).alias("sh")
        )
        .distinct()
        .withColumn("__hit", F.lit(1).cast("long"))
    )
    return (
        d_sh.join(F.broadcast(b_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("sh").cast("long").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles").cast("double"),
            ).alias("contamination_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax shared by Java regex and RE2 so the
# DuckDB oracle matches byte-for-byte (no lookaround, no backrefs).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,2}[- ]\d{3}[- ]\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_features(text: Column | str) -> dict[str, Column]:
    """Counts of email / phone / IPv4 literals plus the redacted text
    (matches replaced with <EMAIL>/<PHONE>/<IP> in that order).
    Redaction order matters only for overlapping classes — emails are
    consumed first so their dotted domains can't re-match as hosts."""
    t = _col(text)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL)).cast("long")
    n_phones = F.regexp_count(t, F.lit(PII_PHONE)).cast("long")
    n_ips = F.regexp_count(t, F.lit(PII_IPV4)).cast("long")
    clean = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    clean = F.regexp_replace(clean, PII_IPV4, "<IP>")
    return {
        "n_emails": n_emails,
        "n_phones": n_phones,
        "n_ips": n_ips,
        "clean_text": clean,
    }


# ---------------------------------------------------------------------------
# passage-level exact dedup
# ---------------------------------------------------------------------------


def passage_dup_stats(
    docs: DataFrame,
    chunk_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Passage-level duplication: split each document into
    non-overlapping ``chunk_tokens``-token passages, md5 each, and
    report per document how many of its passages occur more than once
    in the whole corpus (RefinedWeb-style sub-document dedup — exact
    duplicates and shared boilerplate light up even when full-doc
    hashes differ).

    Scale: explode + hash-groupBy on the chunk digest — the classic
    count-then-join-back, shuffling only (digest, count) pairs.
    Tokens are materialized behind their own projection so the chunk
    lambda indexes a bound attribute — embedding doc_tokens in the
    lambda re-tokenizes the document once per chunk (interpreted
    HOFs have no CSE; the word_shingles lesson)."""
    tk = F.col("__toks")
    k = chunk_tokens
    n_chunks = F.ceil(F.size(tk) / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(
            F.array_join(F.slice(tk, i * k + 1, k), " ")
        ),
    )
    per_chunk = docs.select(
        F.col(id_col), doc_tokens(text_col).alias("__toks")
    ).select(F.col(id_col), F.explode(chunks).alias("chunk_md5"))
    counts = per_chunk.groupBy("chunk_md5").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    return (
        per_chunk.join(counts, "chunk_md5")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(
                F.when(F.col("n_occurrences") > 1, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_dup_chunks"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_dup_chunks",
            (
                F.col("n_dup_chunks").cast("double")
                / F.col("n_chunks").cast("double")
            ).alias("dup_chunk_frac"),
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    chunk_tokens: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_frequent: bool | None = None,
    frequent_broadcast_limit: int = 500_000,
) -> DataFrame:
    """C4-style boilerplate REMOVAL (not just detection): split each
    document into non-overlapping ``chunk_tokens``-token chunks, find
    chunks whose exact text occurs in >= ``min_docs`` distinct
    documents corpus-wide, and rewrite each document from its
    surviving chunks in original order. Complements
    :func:`passage_dup_stats` (which only counts) — this is the
    pipeline stage that actually cleans the corpus (C4's "discard any
    line seen in >= 3 documents", generalized to token chunks since
    web-crawl line structure is absent here).

    Returns one row per input document (fully-boilerplate documents
    survive with ``clean_text = ''``): (id, clean_text, n_chunks,
    n_removed, removed_frac).

    Scale: one explode, then the count-then-anti-join pattern —
    distinct (digest, doc) pairs -> groupBy digest -> frequent set;
    chunks anti-join that set on the digest. The build side AUTO-
    DISPATCHES by default (``broadcast_frequent=None``, the
    :func:`cosine_topk` pattern): the frequent set is
    localCheckpoint'ed eagerly (its lineage — one distinct + groupBy
    over the chunked corpus — runs exactly once; the anti-join reads
    the checkpointed rows), then a bounded ``limit(n+1).count()``
    probe picks BROADCAST when the set fits
    ``frequent_broadcast_limit`` digests (~16 B each) and a shuffled
    digest-keyed anti-join when it doesn't. Broadcast is the right
    plan when boilerplate is what the threshold targets (a small set
    of highly repeated strings); but the set's SIZE scales with
    corpus duplication, not boilerplate — at low ``min_docs`` on a
    duplicate-heavy corpus every shared chunk qualifies, and a forced
    broadcast would exceed executor memory. Callers that already know
    which side of the line they're on pass an explicit True/False to
    skip the probe (and its eager job) entirely.
    Document reassembly shuffles (id, pos, chunk) once
    (map-side combined since rows for a doc are co-located after the
    broadcast anti-join preserves scan partitioning); sort_array of
    (pos, chunk) structs makes collect_list order-independent.
    removed_frac is the single IEEE division at the edge — all other
    outputs exact ints/strings, so DuckDB oracles hash-match.
    """
    tk = F.col("__toks")
    k = chunk_tokens
    n_chunks = F.ceil(F.size(tk) / F.lit(k)).cast("int")

    chunked = docs.select(
        F.col(id_col), doc_tokens(text_col).alias("__toks")
    ).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(tk, i * k + 1, k), " "),
            )
        ).alias("pos", "chunk"),
    ).withColumn("chunk_md5", F.md5(F.col("chunk")))

    frequent = (
        chunked.select("chunk_md5", id_col)
        .distinct()
        .groupBy("chunk_md5")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("chunk_md5")
    )

    if broadcast_frequent is None:
        frequent = frequent.localCheckpoint(eager=True)
        n_freq = frequent.limit(frequent_broadcast_limit + 1).count()
        broadcast_frequent = n_freq <= frequent_broadcast_limit
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    kept = chunked.join(frequent, "chunk_md5", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("chunk")))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )

    base = docs.select(
        F.col(id_col), doc_tokens(text_col).alias("__toks")
    ).select(F.col(id_col), n_chunks.cast("long").alias("n_chunks"))
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
        .withColumn(
            "removed_frac",
            F.col("n_removed").cast("double")
            / F.col("n_chunks").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# domain-weighted mixture sampling
# ---------------------------------------------------------------------------


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    key_cols: tuple[str, ...] = ("doc_id",),
    default_rate: float = 0.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic domain-weighted subsampling — the step that turns
    raw corpora into a training mixture ("web at 30%, wiki at 100%,
    ...", the standard pretraining data-recipe knob).

    Each row draws a reproducible uniform from the md5 of its key
    (first 8 hex chars, compared lexicographically against the rate's
    precomputed 8-hex threshold — pure string compare, so any engine
    that agrees on md5 agrees on the sample, row by row). Keeps a row
    iff u < rate[domain]. Map-only: no shuffle, no RNG state, stable
    under retries/partitioning — at 100 TB the sample is a filter
    pushed into the scan pipeline, and re-running any subset of
    partitions reselects exactly the same rows (the property
    ``F.rand`` does NOT have under task retry).

    Rates outside [0, 1] are clamped; domains absent from ``rates``
    use ``default_rate`` (0.0 = drop unknown domains, the fail-closed
    default for a curated mixture).
    """

    def threshold_hex(rate: float) -> str:
        r = min(max(rate, 0.0), 1.0)
        return format(int(r * 0xFFFFFFFF), "08x")

    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
    )
    u = F.substring(F.md5(key), 1, 8)
    thresh = F.lit(threshold_hex(default_rate))
    for dom, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(domain_col) == dom, F.lit(threshold_hex(rate))
        ).otherwise(thresh)
    return df.filter(u < thresh)


def split_threshold_hexes(
    fractions: Sequence[tuple[str, float]],
) -> list[str]:
    """The 8-hex cumulative thresholds for :func:`hash_split` — ONE
    derivation shared by the engine and any differential oracle.

    Cumulative fractions come from ``math.fsum`` over the exact
    prefix (never repeated float addition), so for ANY fraction list
    the engine and an oracle built from these literals agree on every
    row — a row's md5 draw can sit within 1/2^32 of a boundary, where
    accumulation order would otherwise flip its split.
    """
    fracs = list(fractions)
    return [
        format(
            int(
                min(max(math.fsum(f for _, f in fracs[: i + 1]), 0.0), 1.0)
                * 0xFFFFFFFF
            ),
            "08x",
        )
        for i in range(len(fracs) - 1)
    ]


def hash_split(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training pipeline needs to be reproducible and leak-free.

    Same draw as ``mixture_sample``: u = first 8 hex chars of
    md5(key || seed), compared lexicographically against cumulative
    fraction thresholds, so the assignment is a pure map-side
    expression — stable under retries, repartitioning, and
    re-ingestion (a document keeps its split for life, which is what
    prevents eval contamination when the corpus is rebuilt). The last
    split absorbs the remainder (including the single u == 'ffffffff'
    edge value), so fractions that sum to 1 partition exactly.

    No reference analogue (the reference has no model-training jobs);
    engine-native corpus op alongside mixture_sample
    (client_regeneration/main.py:61-117 is the closest reference
    pattern — deterministic hash-ordered cohort selection).
    """
    fracs = list(fractions)
    if len(fracs) < 2:
        raise ValueError("hash_split needs at least two splits")

    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
    )
    u = F.substring(F.md5(key), 1, 8)
    assigned: Column | None = None
    hexes = split_threshold_hexes(fracs)
    for (name, _frac), hx in zip(fracs[:-1], hexes):
        cond = u < F.lit(hx)
        assigned = (
            F.when(cond, F.lit(name))
            if assigned is None
            else assigned.when(cond, F.lit(name))
        )
    assert assigned is not None
    return df.withColumn(split_col, assigned.otherwise(F.lit(fracs[-1][0])))


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: str = "cap",
) -> DataFrame:
    """Cap any single domain's contribution at ``cap`` rows — the
    anti-head-domain guard (no single site dominating the mixture).

    Survivors are the deterministic hash-ordered prefix per domain:
    rank by md5(key || seed) with the natural key as tie-break, keep
    rank <= cap. One shuffle on the domain key; domains under the cap
    pass through complete. The hash order makes the kept subset a
    uniform sample of the domain, not a storage-order artifact, and
    identical across reruns/engines.

    Skew note: the window ranks every row of a hot domain before
    filtering. At 100 TB, pre-thin hot domains with a cheap
    mixture_sample pass (rate ~ cap / est_count) first so the window
    sees bounded partitions; exact cap still applies here.
    """
    from pyspark.sql import Window

    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.substring(F.md5(key), 1, 16), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= cap)
        .drop("__rank")
    )


def source_overlap(
    docs: DataFrame,
    chunk_tokens: int = 5,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Inter-slice duplication matrix: for every pair of sources,
    how many distinct ``chunk_tokens``-token chunk digests they
    share, and each side's containment fraction (shared / own
    distinct chunks). This is the measure that prioritizes dedup
    work between corpus slices — two crawls with 40% mutual
    containment need cross-slice dedup before mixing; near-zero
    pairs can be curated independently.

    Returns one row per unordered pair (group_a < group_b):
    (group_a, group_b, n_shared, n_a, n_b, frac_a, frac_b).

    Scale: the per-(source, digest) distinct frame is the only thing
    the self-join touches — barriered with a lazy localCheckpoint so
    the scan->chunk->digest subtree computes once, not once per join
    side (broadcast asymmetry defeats exchange reuse). The equi-join
    shuffles narrow (source, digest) pairs on the digest; a digest
    shared by all S sources yields at most S(S-1)/2 pair rows, so
    per-key fan-out is bounded by the (small) source count, never by
    corpus size. Output is S^2-bounded — driver-safe. Each frac is a
    single IEEE division of two exact longs (oracle hash-exact).
    """
    tk = F.col("__toks")
    k = chunk_tokens
    n_chunks = F.ceil(F.size(tk) / F.lit(k)).cast("int")
    digests = (
        docs.select(
            F.col(group_col).alias("grp"), doc_tokens(text_col).alias("__toks")
        )
        .select(
            F.col("grp"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.md5(
                        F.array_join(F.slice(tk, i * k + 1, k), " ")
                    ),
                )
            ).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    totals = digests.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    a, b = digests.alias("a"), digests.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.grp") < F.col("b.grp")),
        )
        .groupBy(
            F.col("a.grp").alias("group_a"), F.col("b.grp").alias("group_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ta = totals.select(F.col("grp").alias("group_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("grp").alias("group_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "group_a")
        .join(F.broadcast(tb), "group_b")
        .select(
            "group_a",
            "group_b",
            "n_shared",
            "n_a",
            "n_b",
            (F.col("n_shared").cast("double") / F.col("n_a").cast("double"))
            .alias("frac_a"),
            (F.col("n_shared").cast("double") / F.col("n_b").cast("double"))
            .alias("frac_b"),
        )
    )


def token_budget_cap(
    df: DataFrame,
    domain_col: str,
    budget: int,
    token_count: Column | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: str = "budget",
    text_col: str = "text",
) -> DataFrame:
    """Token-weighted mixture cap: per domain/source, keep documents
    until the cumulative TOKEN count reaches ``budget`` — the unit a
    training mixture is actually specified in (tokens per source),
    where :func:`domain_cap` counts rows. A document is kept iff the
    running total *through itself* fits the budget, so the emitted
    set never exceeds ``budget`` tokens (the boundary doc that would
    overflow is dropped, as are all after it in hash order).

    Admission order is the deterministic md5(key||seed) order (the
    same uniform-sample trick as domain_cap), so the kept subset is a
    stable uniform sample of the domain, not a storage-order
    artifact. One shuffle on the domain key; the window computes a
    map-side-combinable running sum. Skew note mirrors domain_cap:
    pre-thin hot domains with mixture_sample before the window at
    100 TB so no partition ranks an unbounded domain.
    """
    from pyspark.sql import Window

    toks = (
        token_count
        if token_count is not None
        else F.size(doc_tokens(text_col)).cast("long")
    )
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.substring(F.md5(key), 1, 16), *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn("__cum", F.sum("__toks").over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__toks", "__cum")
    )


def _exp_sample_key(
    w: Column, key_cols: tuple[str, ...], seed: str
) -> Column:
    """The quantized A-ES exponential key ``round(1e6 * -ln(u)/w)``
    (BIGINT) with u = (md5_u32 + 1)/2^32 — ONE derivation shared by
    the global and per-group weighted samplers and their oracles."""
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols], F.lit(seed)
    )
    u32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    u = (u32 + F.lit(1)).cast("double") / F.lit(4294967296.0)
    return F.round(-F.log(u) / w.cast("double") * F.lit(1000000.0), 0).cast(
        "bigint"
    )


def weighted_sample_topk(
    df: DataFrame,
    weight: Column | str,
    k: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: str = "wrs",
    key_out: str = "sample_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, the A-ES scheme): each row draws a
    deterministic uniform u from md5(key||seed) and gets the key
    ``-ln(u) / w`` — an Exp(w) variate — and the k SMALLEST keys are
    an exact weighted sample without replacement (the probability row
    i is selected first is w_i / sum(w), then renormalized over the
    remainder, etc.). This is the quality-weighted data-selection
    primitive mixture_sample (Bernoulli, rate per DOMAIN) cannot
    express: a fixed-size draw where each document's inclusion odds
    scale with its own weight.

    Cross-engine determinism: u = (md5_u32 + 1) / 2^32 is an exact
    double (numerator < 2^32, power-of-two divisor); the key is
    quantized to round(1e6 * (-ln u)/w) as BIGINT so independent
    engines' last-ulp ln() differences cannot flip the selected set,
    and ties break on the id columns. Rows with weight <= 0 are
    excluded (zero-weight rows are unsampleable by definition).

    Scale: the key is a pure row-local expression evaluated at the
    scan; the global smallest-k is orderBy+limit, which Spark plans
    as TakeOrderedAndProject — per-partition top-k heaps then a
    k-row merge on the driver, no corpus shuffle. At 100 TB this is
    one map pass + k rows of traffic per partition.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    ekey = _exp_sample_key(w, key_cols, seed)
    return (
        df.filter(w > 0)
        .withColumn(key_out, ekey)
        .orderBy(F.col(key_out).asc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight: Column | str,
    k: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: str = "wrs",
    key_out: str = "sample_key",
) -> DataFrame:
    """Stratified weighted sampling without replacement: an exact
    ``k``-row A-ES draw (see :func:`weighted_sample_topk`) inside
    EVERY group — "k examples per domain, odds proportional to
    quality" — the fixed-size-per-stratum complement of the global
    top-k draw (and of Bernoulli :func:`mixture_sample`, which fixes
    the RATE per domain, not the count).

    Same deterministic quantized exponential key as the global
    variant, so the two compose (a per-group draw followed by a
    global draw re-uses the same key); rows with weight <= 0 are
    excluded.

    Scale: one shuffle on the group key; the per-group smallest-k is
    a rank window (runs on the shuffled partitions, no second
    exchange). Groups are domains/sources — thousands at most — and
    the output is k·|groups| rows. A hot group costs one partition's
    sort of its rows, bounded by the group's size, never corpus². At
    100 TB pre-thin pathological groups with mixture_sample first,
    as for domain_cap.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    ekey = _exp_sample_key(w, key_cols, seed)
    rk = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            F.col(key_out).asc(), *[F.col(c).asc() for c in key_cols]
        )
    )
    return (
        df.filter(w > 0)
        .withColumn(key_out, ekey)
        .withColumn("__rk", rk)
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the step
    between curation and tokenization in training / retrieval
    pipelines (fixed context budget per sample, overlap so no
    boundary context is lost).

    Deterministic spec: starts are 1, 1+stride, ... (stride =
    window - overlap); a start past the first is emitted only while
    it contributes tokens beyond the previous chunk's overlap
    (s + overlap <= n_tokens), so trailing chunks are never fully
    contained in their predecessor; chunk_id = (start-1)/stride.
    Map-side only (token array -> filtered start sequence ->
    explode): chunking 100 TB is exactly one pass over the scan,
    parallel by partition, no shuffle.

    Returns (id, chunk_id, start_tok, n_tokens, chunk_text).
    """
    if overlap >= window:
        raise ValueError(f"overlap={overlap} must be < window={window}")
    stride = window - overlap
    tk = F.col("__toks")
    # Tokens materialize first so the starts-filter lambda compares
    # against a bound attribute — size(doc_tokens(text)) inside the
    # lambda would re-tokenize the document once per candidate start.
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)), F.lit(stride)),
        lambda s: (s == 1) | ((s + overlap) <= F.size(tk)),
    )
    base = df.select(
        F.col(id_col), doc_tokens(text_col).alias("__toks")
    ).select(F.col(id_col), tk, F.explode(starts).alias("start_tok"))
    chunk = F.slice(F.col("__toks"), F.col("start_tok"), window)
    return base.select(
        F.col(id_col),
        ((F.col("start_tok") - 1) / stride).cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def dedup_repeated_chunks(
    docs: DataFrame,
    chunk_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """INTRA-document repetition removal: split each document into
    non-overlapping ``chunk_tokens``-token chunks and keep only the
    FIRST occurrence of each chunk text within the document — the
    per-doc complement of :func:`strip_boilerplate` (which drops
    chunks frequent across the CORPUS). Targets scraper artifacts:
    doubled page bodies, repeated nav blocks, templated footers
    stuttered through one page.

    Scale: entirely map-side — one order-preserving fold per document
    (``aggregate`` with a conditional append), NO shuffle of any
    kind; a 100 TB pass runs at scan speed. Membership checks are
    O(chunks²) per doc, bounded by document length, not corpus size.

    Returns (id, clean_text, n_chunks, n_removed, removed_frac).
    """
    tk = F.col("__toks")
    k = chunk_tokens
    n_chunks = F.ceil(F.size(tk) / F.lit(k)).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(F.slice(tk, i * k + 1, k), " "),
    )
    kept = F.aggregate(
        chunks,
        F.expr("cast(array() as array<string>)"),
        lambda acc, c: F.when(F.array_contains(acc, c), acc).otherwise(
            F.concat(acc, F.array(c))
        ),
    )
    # Three projection steps: tokens, then the fold result, then the
    # outputs. n_chunks and kept are each referenced several times
    # below — materializing them as columns makes those references
    # bound attributes; embedding them would re-run the whole fold
    # once per consuming output expression (3x per row, measured).
    return (
        docs.select(F.col(id_col), doc_tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            kept.alias("__kept"),
            n_chunks.alias("n_chunks"),
        )
        .select(
            F.col(id_col),
            F.array_join(F.col("__kept"), " ").alias("clean_text"),
            F.col("n_chunks"),
            (F.col("n_chunks") - F.size(F.col("__kept")))
            .cast("long")
            .alias("n_removed"),
            (
                (F.col("n_chunks") - F.size(F.col("__kept"))).cast("double")
                / F.col("n_chunks").cast("double")
            ).alias("removed_frac"),
        )
    )


# ---------------------------------------------------------------------------
# cross-document exact substring dedup (windowed-hash variant)
# ---------------------------------------------------------------------------


def _sliding_starts(toks: Column, k: int) -> Column:
    """1-based start positions of every k-token sliding window
    (stride 1); empty for documents shorter than k tokens."""
    return F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.expr("cast(array() as array<int>)"))


def _remove_spans(base: DataFrame, hits: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared reassembly for span-removal ops: ``base`` carries
    (id, __toks); ``hits`` carries (id, pos) span starts to cut.
    A token survives iff no removed span [s, s+k) covers it. Per-doc
    state is the sorted start list — O(n_tokens) bounded by document
    length, never corpus size, so the per-doc mask is a map-side HOF."""
    cov = hits.groupBy(id_col).agg(
        F.array_sort(F.collect_set("pos")).alias("__starts")
    )
    starts = F.coalesce(F.col("__starts"), F.expr("cast(array() as array<int>)"))
    kept = F.filter(
        F.sequence(F.lit(1), F.size("__toks")),
        lambda p: ~F.exists(starts, lambda s: (p >= s) & (p < s + F.lit(k))),
    )
    n = F.size("__toks")
    return (
        base.join(cov, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(kept, lambda p: F.element_at(F.col("__toks"), p)), " "
            ).alias("clean_text"),
            n.cast("long").alias("n_tokens"),
            (n - F.size(kept)).cast("long").alias("n_removed"),
            ((n - F.size(kept)).cast("double") / n.cast("double")).alias(
                "removed_frac"
            ),
        )
    )


def scrub_spans_at(
    docs: DataFrame,
    hits: DataFrame,
    span_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut ``span_len``-token spans at externally-located start
    positions — the public face of the span-removal kernel for
    callers that already KNOW where the spans are (a positional-index
    phrase probe, a PII detector emitting offsets, a policy list of
    match starts) instead of re-deriving them from window hashes the
    way :func:`cross_doc_span_dedup` / :func:`scrub_benchmark_spans`
    do. ``hits`` carries (id_col, ``pos``) 1-based raw-token starts —
    exactly :func:`~docker_etl_spark.operators.search.
    phrase_match_positions`' exploded ``match_starts`` (both sides
    tokenize as split-on-space lowercase, so positions line up by
    construction).

    Returns every document (hit or not): (id, clean_text, n_tokens,
    n_removed, removed_frac). The per-doc mask is a map-side HOF over
    the sorted start list (document-length bounded); the only shuffle
    is the hits groupBy — |occurrences|, not corpus scale.
    """
    base = docs.select(
        F.col(id_col), doc_tokens(text_col).alias("__toks")
    )
    return _remove_spans(base, hits, span_len, id_col)


def extract_snippets_at(
    docs: DataFrame,
    hits: DataFrame,
    span_len: int,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pull ``window`` context tokens AROUND each externally-located
    span — the search-results-page highlighter, and the READ twin of
    :func:`scrub_spans_at` (that one cuts the span out; this one
    shows it with context). ``hits`` carries (id_col, ``pos``)
    1-based raw-token span starts — exactly
    :func:`~docker_etl_spark.operators.search.
    phrase_match_positions`' exploded ``match_starts`` (both sides
    tokenize as split-on-space lowercase, so positions line up by
    construction; reference has no search/snippet surface — this is
    the training-data-pipeline extension of its report formatting,
    e.g. jobs/search-alert rendering).

    Output: ONE ROW PER OCCURRENCE — (id, pos, snip_start, snip_end,
    snippet) where the snippet is the space-joined tokens of
    [max(1, pos−window), min(n_tokens, pos+span_len−1+window)],
    clamped at document edges. Scale shape: docs inner-join hits on
    the id (occurrence-scale — documents without matches never leave
    the scan), then the slice is a map-side HOF bounded by document
    length; no corpus-scale state anywhere.
    """
    base = docs.select(
        F.col(id_col), doc_tokens(text_col).alias("__toks")
    )
    j = base.join(
        hits.select(F.col(id_col), F.col("pos").cast("int").alias("pos")),
        id_col,
    )
    s = F.greatest(F.lit(1), F.col("pos") - window)
    e = F.least(F.size("__toks"), F.col("pos") + (span_len - 1) + window)
    return j.select(
        F.col(id_col),
        F.col("pos"),
        s.cast("int").alias("snip_start"),
        e.cast("int").alias("snip_end"),
        F.array_join(F.slice("__toks", s, e - s + 1), " ").alias("snippet"),
    )


def cross_doc_span_dedup(
    docs: DataFrame,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """CROSS-document exact substring dedup: any k-token window whose
    text occurs in >= ``min_docs`` distinct documents is a duplicated
    span; the minimum-id document containing the window text is its
    owner and keeps it, every other document has the covering tokens
    cut. The windowed-hash variant of suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better") — exact-match spans, not near-dups, the gap
    MinHash/SimHash (x05/x10) and chunk-hash passage dedup (x34/x40)
    all leave open: those operate at document or fixed-chunk
    granularity, this removes arbitrary-alignment repeated substrings
    while both source documents otherwise survive.

    Scale shape: stride-1 windows emit ~one narrow row per corpus
    token — (xxhash64, id, pos), the documented cost of exact
    substring coverage (the suffix array's O(n) memory turned into
    an O(n)-row shuffle Spark can spill). Two shuffles on the 8-byte
    window hash (partial-agg'd groupBy computing df + owner together,
    then the hit join) and one groupBy on ``id_col``; the reassembly
    mask is a map-side HOF. Hot windows (boilerplate present in
    millions of docs) fan the hit join out linearly in true
    occurrence count — that is the spec, AQE skew-join splits the
    hot hash keys; run :func:`strip_boilerplate` first to shrink
    that tail. Reference analogue: the reference dedups at row
    granularity only (SURVEY §2.6 W1/W2, e.g.
    jobs/search-alert/search_alert/main.py dedup passes); span-level
    dedup is the training-corpus extension.

    Returns (id, clean_text, n_tokens, n_removed, removed_frac).
    """
    base = docs.select(F.col(id_col), doc_tokens(text_col).alias("__toks"))
    wins = base.select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(_sliding_starts(F.col("__toks"), k)).alias("pos"),
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.xxhash64(F.array_join(F.slice("__toks", F.col("pos"), k), " ")).alias(
            "__wkey"
        ),
    )
    dup = (
        wins.groupBy("__wkey")
        .agg(
            F.count_distinct(F.col(id_col)).alias("__df"),
            F.min(F.col(id_col)).alias("__owner"),
        )
        .filter(F.col("__df") >= min_docs)
        .select("__wkey", "__owner")
    )
    hits = (
        wins.join(dup, "__wkey")
        .filter(F.col(id_col) != F.col("__owner"))
        .select(F.col(id_col), "pos")
    )
    return _remove_spans(base, hits, k, id_col)


def scrub_benchmark_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level eval decontamination: cut every k-token window of a
    training document whose text appears ANYWHERE in the benchmark
    set — the removal counterpart of :func:`contamination_check`
    (which only scores overlap). The published n-gram
    decontamination recipe (GPT-3 appendix C-style k-gram scrub):
    documents survive, only the leaked spans are excised.

    The benchmark window set is distinct-ed and BROADCAST (eval sets
    are tiny next to a 100 TB corpus); the corpus side is one
    map-side explode + broadcast semi-join + per-doc groupBy — no
    corpus-wide shuffle on window text.

    Returns (id, clean_text, n_tokens, n_removed, removed_frac).
    """
    base = docs.select(F.col(id_col), doc_tokens(text_col).alias("__toks"))
    b_toks = benchmark.select(doc_tokens(text_col).alias("__toks"))
    b_wins = (
        b_toks.select(
            F.explode(
                F.transform(
                    _sliding_starts(F.col("__toks"), k),
                    lambda s: F.xxhash64(
                        F.array_join(F.slice("__toks", s, k), " ")
                    ),
                )
            ).alias("__wkey")
        )
        .distinct()
    )
    wins = base.select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(_sliding_starts(F.col("__toks"), k)).alias("pos"),
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.xxhash64(F.array_join(F.slice("__toks", F.col("pos"), k), " ")).alias(
            "__wkey"
        ),
    )
    hits = wins.join(F.broadcast(b_wins), "__wkey", "left_semi").select(
        F.col(id_col), "pos"
    )
    return _remove_spans(base, hits, k, id_col)


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (data selection toward a target set)
# ---------------------------------------------------------------------------


def _feature_buckets(toks: Column, n_buckets: int) -> Column:
    """Hashed unigram+bigram feature buckets of a token array — the
    DSIR feature map. Each feature hashes through the engine's
    portable md5 bucket recipe (first 8 hex chars -> bigint ->
    pmod), one array expression per row, no explode until the
    caller asks for one."""
    feats = F.concat(toks, ngram_array(toks, 2))
    return F.transform(
        feats,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ),
    )


def dsir_select(
    source: DataFrame,
    target: DataFrame,
    n_buckets: int = 2048,
    k: int = 200,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    pick the ``k`` source documents whose hashed-n-gram distribution
    looks most like a small high-quality ``target`` set. Both
    distributions are bag-of-hashed-(uni+bi)gram models with add-1
    smoothing over ``n_buckets`` buckets; a document's importance
    weight is sum over its features of
    ``ln((tc_b + 1)(S + m) / ((sc_b + 1)(T + m)))`` — quantized
    per-BUCKET to ``round(scale * ln(...))`` so the per-document
    accumulation is exact integer math (the x22/x46 recipe: one ln
    per bucket at the dim edge, never per row; the only floating
    step is bucket-count-determined, partition-order-free).

    Scale shape: the corpus side is one explode to narrow
    (id, bucket) rows with map-side partial aggregation into the
    ≤ ``n_buckets``-row count dims; the weight dim is
    vocabulary-bounded and BROADCAST into the scoring join, so
    scoring is map-side + one groupBy(id). Selection is a global
    top-k — TakeOrderedAndProject, no full sort. At 100 TB the only
    corpus-sized shuffles carry (id, bucket-weight) pairs.

    Ties break on ``id_col`` so selection is deterministic.

    Returns the selected rows: (id, n_feats, score_sum, sel_rank).
    """
    from pyspark.sql import Window

    m = n_buckets

    def feats_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                _feature_buckets(doc_tokens(text_col), n_buckets)
            ).alias("__bkt"),
        )

    src_feats = feats_of(source)
    tgt_counts = (
        feats_of(target).groupBy("__bkt").agg(F.count("*").alias("__tc"))
    )
    src_counts = src_feats.groupBy("__bkt").agg(F.count("*").alias("__sc"))
    tgt_total = tgt_counts.agg(F.sum("__tc").alias("__T"))
    src_total = src_counts.agg(F.sum("__sc").alias("__S"))
    # every bucket a source doc references exists in src_counts, so
    # the weight dim only needs src buckets; target-only buckets are
    # unreachable from the scoring side.
    weights = (
        src_counts.join(tgt_counts, "__bkt", "left")
        .join(F.broadcast(tgt_total))
        .join(F.broadcast(src_total))
        .select(
            "__bkt",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("__tc"), F.lit(0)) + 1)
                        * (F.col("__S") + m)
                    ).cast("double")
                    / ((F.col("__sc") + 1) * (F.col("__T") + m)).cast(
                        "double"
                    )
                )
                * scale
            )
            .cast("long")
            .alias("__lw"),
        )
    )
    scored = (
        src_feats.join(F.broadcast(weights), "__bkt")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("__lw").alias("score_sum"),
        )
    )
    topk = scored.orderBy(F.desc("score_sum"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_sum"), F.col(id_col))
    return topk.withColumn("sel_rank", F.row_number().over(w).cast("long"))


def leakage_safe_split(
    df: DataFrame,
    near_dup_pairs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    seed: str = "split",
) -> DataFrame:
    """Split assignment that routes whole near-duplicate clusters to
    ONE split — the REPAIR for the leakage :func:`hash_split` alone
    cannot prevent (x39 detects cross-split near-dup pairs; this op
    makes them impossible by construction, the standard fix since
    GPT-2's WebText dedup).

    Every document's split is drawn from the md5 of its CLUSTER
    REPRESENTATIVE (min-id member of its connected component over
    ``near_dup_pairs``; singletons represent themselves), so
    near-dups co-travel. The naive own-id draw rides along so the
    consumer sees exactly which documents moved.

    Scale shape: connected components is the iterative min-label
    propagation (pairs-sized frames, converges in O(log diameter)
    rounds); both split draws are map-side md5 expressions; the only
    corpus-sized join is the left join onto the (near-dup-only,
    much smaller) label frame.

    Output: (id_col, rep_id, split, naive_split, moved).
    """
    from docker_etl_spark.operators.dedupe import connected_components

    labels = connected_components(near_dup_pairs)
    rep = (
        df.select(id_col)
        .join(labels, F.col(id_col) == F.col("node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("rep_id"),
        )
    )
    s = hash_split(
        rep, key_cols=("rep_id",), fractions=fractions, seed=seed,
        split_col="split",
    )
    s = hash_split(
        s, key_cols=(id_col,), fractions=fractions, seed=seed,
        split_col="naive_split",
    )
    return s.select(
        id_col,
        "rep_id",
        "split",
        "naive_split",
        (F.col("split") != F.col("naive_split")).alias("moved"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking at word anchors: a chunk break falls
    AFTER every word whose md5 bucket is ``0 mod divisor`` (expected
    chunk length ~``divisor`` words). Unlike fixed windows (x30),
    boundaries are a function of CONTENT — inserting a word
    re-chunks only its own neighborhood, every other chunk digest
    survives, which is the property that makes chunk-level dedup
    stable under edits (the rsync/LBFS recipe applied to text).

    One linear fold per document (aggregate with a
    (done-chunks, current-chunk) accumulator — no O(n^2) prefix
    scans, no explode until the consumer asks for rows); the anchor
    draw is the engine-wide md5-bucket idiom, so the chunking
    replays exactly in SQL.

    Output: one row per chunk (id_col, chunk_idx, chunk, n_words).
    """
    w = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    acc0 = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit("").alias("cur"),
    )

    def step(acc, word):
        cur2 = F.when(acc["cur"] == "", word).otherwise(
            F.concat(acc["cur"], F.lit(" "), word)
        )
        anchor = (
            F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("bigint")
            % divisor
            == 0
        )
        return F.when(
            anchor,
            F.struct(
                F.array_append(acc["done"], cur2).alias("done"),
                F.lit("").alias("cur"),
            ),
        ).otherwise(F.struct(acc["done"].alias("done"), cur2.alias("cur")))

    chunks = F.aggregate(
        w,
        acc0,
        step,
        lambda a: F.when(
            a["cur"] != "", F.array_append(a["done"], a["cur"])
        ).otherwise(a["done"]),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk",
            F.size(F.split(F.col("chunk"), " ")).cast("long").alias("n_words"),
        )
    )


def cdc_chunk_census(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 8,
) -> DataFrame:
    """Per-group chunk-level dedup census over :func:`cdc_chunks`:
    how much of a source is repeated CHUNKS (boilerplate, templated
    spans) that document-level dedup can't see? Exact integer
    counts; the two ratios are single double divisions.

    Scale shape: the fold is map-side; the census is one groupBy on
    (group, digest) equivalent — here count(distinct md5(chunk))
    per group, partial-aggregatable.
    """
    ch = cdc_chunks(
        df, id_col=id_col, text_col=text_col, divisor=divisor
    ).join(df.select(F.col(id_col), F.col(group_col)), id_col)
    t = F.count("*").cast("long")
    dc = F.count_distinct(F.md5(F.col("chunk"))).cast("long")
    tw = F.sum("n_words").cast("long")
    return ch.groupBy(group_col).agg(
        t.alias("total_chunks"),
        dc.alias("distinct_chunks"),
        tw.alias("total_words"),
        (
            (t - dc).cast("double") / t.cast("double")
        ).alias("dup_chunk_ratio"),
        (tw.cast("double") / t.cast("double")).alias("mean_chunk_words"),
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 1,
    batch_size: int = 32,
    seed: str = "order",
    range_partitions: int = 32,
) -> DataFrame:
    """Deterministic global training order + batch assignment — the
    last step of corpus assembly: every document appears once per
    epoch, shuffled by an md5 draw over (id, epoch, seed) so the
    order is reproducible across reruns, partitionings, and cluster
    sizes, and every example knows its global position and batch.

    The global index is computed WITHOUT a single-partition window
    (the naive ``row_number() OVER (ORDER BY key)`` collapses 100 TB
    onto one task): rows range-partition on the draw key, each
    partition ranks locally, and the per-partition row counts — a
    bounded ``range_partitions``-row collect — become broadcast
    prefix offsets. Positions are a total order (the draw key is
    unique per (id, epoch)), so the result is IDENTICAL to the
    single-window form regardless of where sampling places the range
    boundaries.

    Output: (id_col, epoch, ord_key, position, batch_id), positions
    1-based over epochs x |df|.
    """
    epochs = F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch")
    keyed = df.select(F.col(id_col)).select(F.col(id_col), epochs).select(
        id_col,
        F.col("epoch").cast("long").alias("epoch"),
        F.md5(
            F.concat_ws(
                ":",
                F.col(id_col).cast("string"),
                F.col("epoch").cast("string"),
                F.lit(seed),
            )
        ).alias("ord_key"),
    )
    # Eager checkpoint: the counts pass and the final plan must read
    # the SAME materialized range partitioning — re-evaluating
    # repartitionByRange could re-sample different boundaries and
    # desynchronize the offsets from the pids.
    ranged = (
        keyed.repartitionByRange(range_partitions, "ord_key")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Bounded collect (range_partitions rows): per-partition counts
    # become broadcast prefix offsets.
    counts = (
        ranged.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__pid"], acc))
        acc += r["count"]
    spark = df.sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("ord_key")
    pos = (F.col("__off") + F.row_number().over(w)).cast("long")
    return (
        ranged.join(F.broadcast(off), "__pid")
        .select(
            id_col,
            "epoch",
            "ord_key",
            pos.alias("position"),
            ((pos - 1) / batch_size).cast("long").alias("batch_id"),
        )
    )


def pack_shards(
    df: DataFrame,
    weight_col: str,
    n_shards: int,
    id_col: str = "doc_id",
    range_partitions: int = 32,
) -> DataFrame:
    """Token-balanced shard assignment — the corpus-assembly finisher
    after :func:`training_order`: every document lands in one of
    ``n_shards`` output shards such that per-shard token totals are
    near-equal (training data loaders stall on the largest shard, so
    shard spread IS tail latency).

    Recipe: global rank by (weight DESC, id) — the longest-processing-
    time order — then SERPENTINE round-robin over the rank
    (shard = slot on even passes, n-1-slot on odd passes), the
    classic folded assignment whose per-shard totals differ by at
    most ~one document weight on sorted input. Deterministic integer
    construction end-to-end, so an independent engine replays the
    exact assignment.

    The global rank reuses :func:`training_order`'s scale shape: NO
    single-partition window — range partition on the (negated
    weight, id) key, local ranks, bounded per-partition counts as
    broadcast prefix offsets, checkpoint-pinned so the counts pass
    and the rank pass read one materialized partitioning.

    Output: (id_col, weight, shard).
    """
    keyed = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("__w"),
    ).withColumn("__negw", -F.col("__w"))
    ranged = (
        keyed.repartitionByRange(range_partitions, "__negw", id_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("__pid").count().orderBy("__pid").collect()
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__pid"], acc))
        acc += r["count"]
    spark = df.sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("__negw", id_col)
    pos0 = (F.col("__off") + F.row_number().over(w) - 1).cast("long")
    ride = F.floor(pos0 / n_shards) % 2
    slot = pos0 % n_shards
    shard = F.when(ride == 0, slot).otherwise(F.lit(n_shards - 1) - slot)
    return (
        ranged.join(F.broadcast(off), "__pid")
        .select(
            id_col,
            F.col("__w").alias("weight"),
            shard.cast("int").alias("shard"),
        )
    )
