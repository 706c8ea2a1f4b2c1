"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Training-data-pipeline operators over a ``documents``-shaped table.
All pure Column expressions (split / filter / transform / md5) so
they run inside whole-stage codegen at any scale — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docker_etl_spark.functions.scalars import safe_divide
from docker_etl_spark.operators.text_dedup import word_shingles

# Compact function-word profiles. A real deployment would use larger
# lists or character-n-gram models; the operator shape (profile
# overlap scoring) is the same.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我"),
}


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    if lowercase:
        t = F.lower(t)
    return F.split(t, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the reference-free tokenizer baseline)."""
    return F.size(tokens(text, lowercase=False))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: split on word boundaries/punctuation so
    punctuation and numbers count as separate tokens — a deterministic
    stand-in for a real subword tokenizer."""
    t = F.col(text) if isinstance(text, str) else text
    pieces = F.split(t, r"(?<=\W)|(?=\W)")
    return F.size(F.filter(pieces, lambda p: (p != "") & (p != " ")))


def stopword_overlap(toks: Column, words: tuple[str, ...]) -> Column:
    """How many distinct tokens appear in a stopword profile."""
    return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))


def langid_scores(text: Column | str) -> dict[str, Column]:
    """Per-language profile-overlap scores."""
    toks = tokens(text)
    return {lang: stopword_overlap(toks, words) for lang, words in LANG_STOPWORDS.items()}


def langid_predict(text: Column | str) -> Column:
    """Heuristic language ID: argmax of profile overlap, fixed
    priority order on ties ('en' > 'de' > 'es' > 'fr' > 'zh'),
    'und' when every score is zero."""
    scores = langid_scores(text)
    langs = list(scores)
    pred = F.lit("und")
    # Build the when-chain in reverse priority so earlier langs win ties.
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        cond = cond & (scores[lang] > 0)
        branch = F.when(cond, F.lit(lang))
        expr = branch if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(pred)


def quality_features(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Per-document quality features: token count, mean token length,
    stopword ratio, punctuation ratio, uppercase ratio, repetition
    (distinct-token ratio). The classic cheap quality filters of a
    pretraining pipeline."""
    t = F.col(text_col)
    toks = tokens(text_col, lowercase=False)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop = stopword_overlap(tokens(text_col), LANG_STOPWORDS["en"])
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return df.select(
        *[F.col(c) for c in id_cols],
        n_tok.cast("bigint").alias("n_tokens"),
        safe_divide(n_chars.cast("double"), F.nullif(n_tok, F.lit(0))).alias("chars_per_token"),
        safe_divide(stop.cast("double"), F.nullif(n_tok, F.lit(0))).alias("stopword_ratio"),
        safe_divide(n_punct.cast("double"), F.nullif(n_chars, F.lit(0))).alias("punct_ratio"),
        safe_divide(n_upper.cast("double"), F.nullif(n_chars, F.lit(0))).alias("upper_ratio"),
        safe_divide(
            F.size(F.array_distinct(toks)).cast("double"), F.nullif(n_tok, F.lit(0))
        ).alias("distinct_token_ratio"),
    )


def document_fingerprint(
    text: Column | str, k: int = 5, shingle_n: int = 3
) -> Column:
    """Winnowing-style fingerprint: the k lexicographically-smallest
    shingle digests. Robust to local edits; two documents sharing most
    shingles share most fingerprint entries. array<string> length ≤ k."""
    sh = word_shingles(text, shingle_n)
    return F.slice(F.array_sort(F.transform(sh, lambda s: F.md5(s))), 1, k)


def fingerprint_key(text: Column | str, k: int = 5, shingle_n: int = 3) -> Column:
    """Single-value digest of the fingerprint — a clusterable key."""
    return F.md5(F.array_join(document_fingerprint(text, k, shingle_n), ""))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_token_len: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document, tf-idf style: rank a
    document's terms by term frequency descending, breaking ties by
    document frequency ascending (rarer wins — the idf direction),
    then term ascending. Integer-only ordering, so the ranking is
    bit-reproducible across engines; a float tf·log(N/df) score ranks
    identically within a document when tf dominates and serves the
    same keyword-extraction purpose.

    Two shuffles at any scale: one groupBy (term df over the corpus —
    bounded by vocabulary, not corpus size) and one window partitioned
    by document (top-k per doc). The df side is a vocabulary-sized
    dimension; Spark broadcasts it into the per-doc join when small
    and hash-joins on the term key when not — never all-pairs.
    """
    from pyspark.sql import Window

    toks = F.filter(
        tokens(text_col), lambda t: F.length(t) >= min_token_len
    )
    term_rows = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    doc_freq = term_rows.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        term_rows.join(doc_freq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )


def bm25_term_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.25,
    b: float = 0.75,
    min_token_len: int = 3,
) -> DataFrame:
    """Per-(document, query-term) BM25 relevance scores.

    The retrieval primitive of a training-data curation stack (query a
    100 TB corpus for topical slices). One row per document x matched
    query term with the classic BM25 saturation term:

        score = odds_idf * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl))
        odds_idf = (N - df + 0.5) / (df + 0.5)

    ``odds_idf`` is the Robertson idf *before* the log — ln() is the
    one BM25 op whose last-ulp value differs across math libraries, and
    it is monotone, so ranking by the rational form is
    ranking-equivalent and bit-reproducible (same reason
    tfidf_top_terms ranks on integers). k1 defaults to 1.25 (an exact
    binary fraction, unlike the textbook 1.2) so every constant in the
    chain is exactly representable; with explicit parenthesization both
    engines evaluate the identical correctly-rounded IEEE op sequence.

    Scale: the explode is pre-filtered to the query-term set, so the
    shuffled (doc, term) stream is |matches|, not |tokens|; corpus
    stats (N, total dl) are a 1-row broadcast; df per query term is a
    |terms|-row broadcast. No window, no all-pairs anything.
    """
    toks = F.filter(
        tokens(text_col), lambda t: F.length(t) >= min_token_len
    )
    docs = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("dl"),
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    term_set = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        docs.select(
            F.col(id_col),
            F.col("dl"),
            F.explode(
                F.filter(F.col("__toks"), lambda t: F.array_contains(term_set, t))
            ).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    doc_freq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    joined = (
        tf.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / nd
    odds_idf = (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    score = odds_idf * (
        (tfd * F.lit(k1 + 1.0))
        / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / avgdl)))
    )
    return joined.select(
        F.col(id_col), "term", "tf", "df", "dl", score.alias("score")
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document
    — the self-supervised stand-in for the KenLM-perplexity quality
    filter every published pretraining pipeline runs (CCNet-style):
    documents whose word transitions are improbable UNDER THE CORPUS
    ITSELF score low (spam, boilerplate, shredded text), no external
    model needed.

    p(w2|w1) = c(w1 w2) / c(w1 ·), both counts from this corpus. To
    stay cross-engine exact there is no log anywhere: each bigram
    instance contributes floor(scale * n12 / n1) — an integer (the
    product is exact in a double up to 2^53, then ONE IEEE division
    and a floor) — summed exactly per document; the mean takes one
    final division. Ranking by mean scaled probability orders
    documents the same direction as negative perplexity for the
    filtering use.

    Scale: bigram instances collapse to per-(doc, bigram) counts
    FIRST (one shuffle, map-side partial agg), and that compact
    frame — materialized once behind a lazy barrier — feeds the two
    vocabulary-bounded count tables and the score join, so the
    explode pass over the corpus runs exactly once. A duplicate
    transition inside a document contributes m·sc, identical to
    scoring each instance.

    Returns (id, n_bigrams, score_sum, lm_score, min_score):
    ``lm_score`` = mean scaled transition probability, ``min_score``
    = the most surprising transition (exact int) — the two knobs the
    published filters threshold.
    """
    from docker_etl_spark.operators._util import spread_for_compute

    toks = tokens(text_col)
    # zip_with over shifted slices: toks referenced top-level only
    # (element_at(toks, i) inside an index lambda re-tokenizes per
    # bigram — no CSE in interpreted HOFs). Docs with < 2 tokens
    # need the explicit empty branch (sequence/slice would count
    # down / reject a non-positive length).
    m = F.size(toks) - 1
    grams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = F.when(F.size(toks) >= 2, grams).otherwise(
        F.expr("cast(array() as array<string>)")
    )
    inst = (
        spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(bg).alias("b"))
        .withColumn("w1", F.split(F.col("b"), " ").getItem(0))
    )
    dbg = (
        inst.groupBy(id_col, "b", "w1")
        .agg(F.count("*").cast("long").alias("m"))
        .localCheckpoint(eager=False)
    )
    c12 = dbg.groupBy("b").agg(F.sum("m").cast("long").alias("n12"))
    c1 = dbg.groupBy("w1").agg(F.sum("m").cast("long").alias("n1"))
    sc = F.floor(
        F.lit(float(scale)) * F.col("n12").cast("double")
        / F.col("n1").cast("double")
    ).cast("long")
    scored = (
        dbg.join(c12, "b")
        .join(c1, "w1")
        .select(F.col(id_col), F.col("m"), sc.alias("sc"))
    )
    n = F.sum("m").cast("long")
    ssum = F.sum(F.col("m") * F.col("sc")).cast("long")
    return scored.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        ssum.alias("score_sum"),
        (ssum.cast("double") / n.cast("double")).alias("lm_score"),
        F.min("sc").cast("long").alias("min_score"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Adjacent-pair collocation mining by pointwise mutual
    information — the corpus-analysis primitive behind phrase
    vocabularies, tokenizer merge seeding, and query expansion
    (Church & Hanks 1990). For an adjacent word pair (w1, w2):

        pmi = ln( c(w1 w2) · N / (c(w1 ·) · c(· w2)) )

    with N the corpus bigram total and the marginals counted in
    PAIR POSITION (c(w1 ·) = bigrams starting with w1, c(· w2) =
    bigrams ending with w2 — they sum to N exactly, so pmi is a true
    log-odds against the independence model).

    Cross-engine discipline: all four counts are exact integers from
    the SAME compact bigram-count table (one explode pass, one
    shuffle, lazy-barriered — the :func:`bigram_lm_scores` recipe);
    the ratio is formed in IEEE doubles (cast BEFORE multiplying —
    c·N overflows int64 at 100 TB corpus sizes) and quantized ONCE:
    ``pmi_scaled = round(scale · ln(ratio))`` (the BM25-idf recipe, so
    rankings hash-match any engine). ``min_count`` drops rare pairs
    BEFORE the marginal joins (PMI's known rare-pair pathology:
    singleton pairs of singleton words score ln N) — marginals still
    count the FULL table.

    Scale: the explode pass over the corpus runs exactly once; the
    count table and both marginal tables are vocabulary-bounded, so
    every join after the first aggregate is vocab-scale, not
    corpus-scale.

    Returns (w1, w2, n_pair, pmi_scaled) — every surviving pair,
    unranked; take a global top-k (orderBy+limit → TakeOrdered) or a
    per-w1 group top-k (``row_number() <= k`` → WindowGroupLimit)
    downstream.
    """
    from docker_etl_spark.operators._util import spread_for_compute

    toks = tokens(text_col)
    m = F.size(toks) - 1
    grams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = F.when(F.size(toks) >= 2, grams).otherwise(
        F.expr("cast(array() as array<string>)")
    )
    pairs = (
        spread_for_compute(df.select(F.col(text_col)))
        .select(F.explode(bg).alias("b"))
        .select(
            F.split(F.col("b"), " ").getItem(0).alias("w1"),
            F.split(F.col("b"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .localCheckpoint(eager=False)
    )
    c1 = pairs.groupBy("w1").agg(F.sum("n_pair").cast("long").alias("n_w1"))
    c2 = pairs.groupBy("w2").agg(F.sum("n_pair").cast("long").alias("n_w2"))
    nb = pairs.agg(F.sum("n_pair").cast("long").alias("n_total"))
    ratio = (
        F.col("n_pair").cast("double") * F.col("n_total").cast("double")
    ) / (F.col("n_w1").cast("double") * F.col("n_w2").cast("double"))
    return (
        pairs.filter(F.col("n_pair") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(F.log(ratio) * scale).cast("long").alias("pmi_scaled"),
        )
    )


def vocab_oov_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 500,
) -> DataFrame:
    """Corpus vocabulary + per-document out-of-vocabulary rate — the
    tokenizer-prep probe (how much of each document a top-N word
    vocabulary covers; high OOV flags junk, code, or the wrong
    language for the vocab).

    Vocabulary = top ``vocab_size`` tokens by corpus count,
    deterministic at the cut (count desc, token asc — engines agree
    at the boundary). The count table is vocabulary-bounded; the
    top-N is a TakeOrdered over it (never a global sort of
    instances); membership joins back broadcast. OOV rate is exact
    ints + one IEEE division.

    Returns (id, n_tokens, n_oov, oov_rate).
    """
    inst = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    vc = inst.groupBy("t").agg(F.count("*").cast("long").alias("c"))
    vocab = (
        vc.orderBy(F.desc("c"), F.asc("t"))
        .limit(vocab_size)
        .select("t", F.lit(1).alias("__in_vocab"))
    )
    joined = inst.join(F.broadcast(vocab), "t", "left")
    n = F.count("*").cast("long")
    oov = (
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
    )
    return joined.groupBy(id_col).agg(
        n.alias("n_tokens"),
        oov.alias("n_oov"),
        (oov.cast("double") / n.cast("double")).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# BPE merge-rule training (tokenizer learning over the corpus)
# ---------------------------------------------------------------------------

_BPE_MARK = "\x01"


def bpe_train_merges(
    df: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    end_token: str = "</w>",
) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merge rules
    from the corpus (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units") — the tokenizer-
    training stage of an LLM data pipeline, run where the data
    lives. Classic BPE trains on the word-frequency dictionary, so
    the corpus collapses to a vocabulary-bounded (word, count) dim
    after ONE scan; each round then counts adjacent symbol pairs
    weighted by word count, picks the argmax (ties break on the
    pair string, so training is deterministic), and merges every
    non-overlapping occurrence left-to-right.

    The symbolization trick that keeps every round a JVM expression:
    a word's symbol sequence is one string with each symbol wrapped
    in ``\\x01`` marks (``\\x01t\\x01\\x01h\\x01...``). Wrapping each
    symbol in its OWN mark pair means applying a merge is a plain
    ``replace(enc, M+a+M+M+b+M, M+ab+M)`` — string replace scans
    left-to-right over non-overlapping matches, which is exactly
    BPE's greedy merge order, and adjacent occurrences keep their
    delimiters (nothing is shared between matches). Words containing
    the mark character are excluded up front.

    Scale shape: one corpus scan builds the vocab dim (lazily
    barriered — rounds re-read the materialized dim, not the
    corpus); per round, the pair stream is vocabulary-bounded and
    narrow, the argmax is a 1-row ORDER BY LIMIT 1 broadcast into
    the next round's map-side replace. Driver holds nothing; the
    k chosen rules are 1-row barriered frames. n_merges chains k
    such stages — k is a small constant (real tokenizers train tens
    of thousands of merges; at that count you shard the pair stream
    the same way, the per-round plan is unchanged).

    Returns (merge_round, left_sym, right_sym, merged, pair_count).
    """
    M = _BPE_MARK
    vocab = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__w")
        )
        .filter((F.col("__w") != "") & (~F.col("__w").contains(M)))
        .groupBy("__w")
        .agg(F.count("*").cast("long").alias("__cnt"))
    )
    enc = F.concat(
        F.array_join(
            F.transform(F.split("__w", ""), lambda c: F.concat(F.lit(M), c, F.lit(M))),
            "",
        ),
        F.lit(M + end_token + M),
    )
    cur = vocab.select(F.col("__cnt"), enc.alias("__enc")).localCheckpoint(
        eager=False
    )
    rules = []
    for r in range(1, n_merges + 1):
        inner = F.col("__enc").substr(F.lit(2), F.length("__enc") - 2)
        syms = F.split(inner, M + M)
        # zip_with over shifted slices (top-level syms references —
        # element_at(syms, i) in an index lambda re-splits the
        # encoding per pair); a fully-merged word (one symbol) must
        # emit an explicit empty pair list (sequence counts down).
        npairs = F.size(syms) - 1
        pair_arr = F.when(
            F.size(syms) >= 2,
            F.zip_with(
                F.slice(syms, 1, npairs),
                F.slice(syms, 2, npairs),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.expr("cast(array() as array<string>)"))
        pairs = cur.select(
            F.col("__cnt"), F.explode(pair_arr).alias("__pair")
        )
        best = (
            pairs.groupBy("__pair")
            .agg(F.sum("__cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.col("__pair"))
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("merge_round"),
                F.split("__pair", " ").getItem(0).alias("left_sym"),
                F.split("__pair", " ").getItem(1).alias("right_sym"),
                F.replace(F.col("__pair"), F.lit(" "), F.lit("")).alias(
                    "merged"
                ),
                F.col("pair_count"),
            )
            .localCheckpoint(eager=False)
        )
        rules.append(best)
        if r < n_merges:
            cur = cur.crossJoin(F.broadcast(best)).select(
                "__cnt",
                F.replace(
                    F.col("__enc"),
                    F.concat(
                        F.lit(M),
                        F.col("left_sym"),
                        F.lit(M + M),
                        F.col("right_sym"),
                        F.lit(M),
                    ),
                    F.concat(F.lit(M), F.col("merged"), F.lit(M)),
                ).alias("__enc"),
            )
    out = rules[0]
    for b in rules[1:]:
        out = out.unionAll(b)
    return out


def bpe_apply_merges(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    end_token: str = "</w>",
) -> DataFrame:
    """Apply learned BPE merge rules (:func:`bpe_train_merges`
    output) to a corpus and count the resulting subword tokens per
    document — the train→apply loop of tokenizer work, and the
    "token counting with a BPE-ish" pass of the curation mandate
    (whitespace counts over- or under-state sequence lengths once a
    subword tokenizer exists; context-window packing needs THESE
    numbers).

    Each document's words go through the same mark-wrapped encoding
    as training; the k merge rules arrive as a BROADCAST k-row dim
    collapsed to one in-plan replace chain via an aggregate fold
    over the rules sorted by round (k is tokenizer-sized, corpus is
    never shuffled — the whole pass is map-side). Words containing
    the mark character fall back to 1 word = 1 token.

    Returns (id, n_words, n_bpe_tokens, tokens_per_word).
    """
    M = _BPE_MARK
    rules = merges.select(
        F.sort_array(
            F.collect_list(
                F.struct("merge_round", "left_sym", "right_sym", "merged")
            )
        ).alias("__rules")
    )
    toks = F.split(F.lower(F.col(text_col)), " ")
    words = F.filter(toks, lambda w: (w != "") & ~w.contains(M))
    enc_word = lambda w: F.concat(  # noqa: E731
        F.array_join(
            F.transform(F.split(w, ""), lambda c: F.concat(F.lit(M), c, F.lit(M))),
            "",
        ),
        F.lit(M + end_token + M),
    )
    merged_word = lambda w: F.aggregate(  # noqa: E731
        F.col("__rules"),
        enc_word(w),
        lambda acc, r: F.replace(
            acc,
            F.concat(
                F.lit(M), r["left_sym"], F.lit(M + M), r["right_sym"], F.lit(M)
            ),
            F.concat(F.lit(M), r["merged"], F.lit(M)),
        ),
    )
    # token count = number of mark PAIRS across the doc's merged
    # words = half the marks; marks = length delta after stripping.
    # One concatenated merged encoding per doc so the replace chain
    # is evaluated exactly once per word.
    merged_all = F.aggregate(
        words, F.lit(""), lambda a, w: F.concat(a, merged_word(w))
    )
    n_words = F.size(words).cast("long")
    n_bpe = (
        (F.length(merged_all) - F.length(F.replace(merged_all, F.lit(M)))) / 2
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(rules))
        .select(
            F.col(id_col),
            n_words.alias("n_words"),
            n_bpe.alias("n_bpe_tokens"),
        )
        .withColumn(
            "tokens_per_word",
            F.when(
                F.col("n_words") > 0,
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_words").cast("double"),
            ),
        )
    )


def corpus_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
    exact: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group lexical diversity census: type-token ratio and
    distinct-n-gram ratio — the redundancy fingerprint mixture
    design reads before weighting a source (a templated/boilerplate
    corpus shows high volume but low distinct-trigram ratio; dedup
    fixes documents, THIS flags the source).

    With ``exact=True``: integer counts; each ratio is one double
    division, so the output replays bit-identically cross-engine.

    With ``exact=False``: distinct counts come from HLL++ sketches
    (``approx_count_distinct`` at relative error ``rsd``) and the
    n-gram TOTAL comes from doc-level gram-array sizes — so the
    (group, gram) shuffle, the steepest non-envelope 100x curve in
    the exact plan (14.9x, BASELINE.md), disappears entirely: the
    only shuffled state is one HLL sketch per (partition, group)
    partial. This is the 100 TB mode; the x77 guardrail query pins
    its error against the exact census.

    Scale shape (exact): the distinct-gram count is the one real
    shuffle (explode -> groupBy (group, gram) -> per-group count);
    word totals ride a doc-level aggregate (no explode). Both aggs
    are partial-aggregatable; nothing is quadratic.

    Output: (group_col, n_docs, total_words, distinct_words,
    type_token_ratio, total_ngrams, distinct_ngrams, ngram_diversity).
    """
    w = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    # Sliding grams via zip_with over shifted slices — every reference
    # to w is top-level (evaluated ~shingle_n+2 times per ROW); the
    # transform-over-indexes shape re-evaluates the filter+split once
    # per GRAM inside the lambda (no CSE in interpreted HOFs).
    m = F.size(w) - shingle_n + 1
    sl = F.slice(w, 1, m)
    for j in range(1, shingle_n):
        sl = F.zip_with(
            sl, F.slice(w, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.when(F.size(w) >= shingle_n, sl).otherwise(
        F.array().cast("array<string>")
    )

    doc_stats = df.select(
        F.col(group_col),
        F.size(w).alias("__nw"),
        F.size(grams).alias("__ng"),
    ).groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__nw").cast("long").alias("total_words"),
        F.sum("__ng").cast("long").alias("__total_ngrams_doc"),
    )
    if exact:
        dw = (
            df.select(F.col(group_col), F.explode(w).alias("__t"))
            .groupBy(group_col)
            .agg(F.count_distinct("__t").cast("long").alias("distinct_words"))
        )
        gr = (
            df.select(F.col(group_col), F.explode(grams).alias("__g"))
            .groupBy(group_col, "__g")
            .agg(F.count("*").cast("long").alias("__c"))
            .groupBy(group_col)
            .agg(
                F.count("*").cast("long").alias("distinct_ngrams"),
                F.sum("__c").cast("long").alias("total_ngrams"),
            )
        )
    else:
        dw = (
            df.select(F.col(group_col), F.explode(w).alias("__t"))
            .groupBy(group_col)
            .agg(
                F.approx_count_distinct("__t", rsd)
                .cast("long")
                .alias("distinct_words")
            )
        )
        gr = (
            df.select(F.col(group_col), F.explode(grams).alias("__g"))
            .groupBy(group_col)
            .agg(
                F.approx_count_distinct("__g", rsd)
                .cast("long")
                .alias("distinct_ngrams")
            )
            # totals come from the doc-level sizes — joined back below
        )
    out = doc_stats.join(dw, group_col, "left").join(gr, group_col, "left")
    if not exact:
        out = out.withColumn("total_ngrams", F.col("__total_ngrams_doc"))
    out = out.drop("__total_ngrams_doc")
    z = lambda c: F.coalesce(F.col(c), F.lit(0).cast("long"))  # noqa: E731
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, num.cast("double") / den.cast("double")
    )
    return out.select(
        group_col,
        "n_docs",
        z("total_words").alias("total_words"),
        z("distinct_words").alias("distinct_words"),
        ratio(z("distinct_words"), z("total_words")).alias("type_token_ratio"),
        z("total_ngrams").alias("total_ngrams"),
        z("distinct_ngrams").alias("distinct_ngrams"),
        ratio(z("distinct_ngrams"), z("total_ngrams")).alias("ngram_diversity"),
    )


def source_containment_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-source overlap at SHINGLE granularity: for every source
    pair, the common distinct-n-gram count plus containment in each
    direction and Jaccard — the "how much of corpus A is already
    inside corpus B" matrix that decides whether acquiring a new
    source adds anything (x36's digest matrix answers this only for
    verbatim whole-document copies; shingle containment sees partial
    and remixed reuse).

    Exact integer counts; the three ratios are single double
    divisions. Scale shape: one distinct over (source, shingle) — the
    real shuffle, partial-aggregatable — then a self equi-join ON THE
    SHINGLE (each shingle contributes its own source-pair list, never
    a cross join); with k sources the output is k(k-1)/2 rows.

    Output: (source_a, source_b, n_a, n_b, n_common,
    containment_a, containment_b, jaccard), source_a < source_b.
    """
    from docker_etl_spark.operators.text_dedup import word_shingles

    sh = (
        df.select(
            F.col(group_col).alias("__src"),
            F.explode(word_shingles(text_col, shingle_n)).alias("__g"),
        )
        .distinct()
    )
    sizes = sh.groupBy("__src").agg(F.count("*").cast("long").alias("__n"))
    a = sh.select(F.col("__src").alias("source_a"), "__g")
    b = sh.select(F.col("__src").alias("source_b"), "__g")
    common = (
        a.join(b, "__g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    out = (
        common.join(
            F.broadcast(sizes.withColumnRenamed("__src", "source_a")),
            "source_a",
        )
        .withColumnRenamed("__n", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("__src", "source_b")),
            "source_b",
        )
        .withColumnRenamed("__n", "n_b")
    )
    c = F.col("n_common").cast("double")
    return out.select(
        "source_a",
        "source_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "n_common",
        (c / F.col("n_a").cast("double")).alias("containment_a"),
        (c / F.col("n_b").cast("double")).alias("containment_b"),
        (
            c
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
        ).alias("jaccard"),
    )
