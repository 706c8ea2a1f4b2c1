"""Batched model inference (SURVEY.md §2.9 F8).

The reference scores rows through remote models: the bugbug
break-site classifier and a translation service, called over HTTP in
batches from the driver (broken_site_report_ml/main.py:13-68,
228-277). Engine form: an Arrow-batched ``mapInPandas`` stage — each
batch is one model call, executors parallelize the calls, and the
model client is injected so tests run a deterministic local stub
(no HTTP in this container) while production passes a
requests-backed scorer.

Scale notes: batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session default);
inference concurrency = task parallelism — repartition upstream to
match the service's rate limits, and keep retries/dead-lettering in
the sink layer (streaming/core.foreach_batch_with_dead_letter), not
in the kernel.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def stub_break_probability(texts: pd.Series) -> pd.Series:
    """Deterministic local stand-in for the bugbug classifier:
    squashed linear score over two cheap text features. Clearly a
    fake — the seam (batching, schema, parallelism) is what's real.

    The squashing is the RATIONAL sigmoid 0.5·(1 + z/(1+|z|)), not
    the logistic: every op is basic IEEE arithmetic (no exp), so any
    engine reproduces the scores bit-for-bit — which is what lets
    i01's differential oracle check the Arrow round-trip exactly
    instead of settling for a rows-only smoke."""
    n_chars = texts.str.len().astype("float64")
    n_bangs = texts.str.count("!").astype("float64")
    z = -3.0 + 0.002 * n_chars + 0.8 * n_bangs
    return 0.5 * (1.0 + z / (1.0 + np.abs(z)))


def batched_inference(
    df: DataFrame,
    text_col: str,
    score_fn: Callable[[pd.Series], pd.Series] = stub_break_probability,
    score_col: str = "score",
) -> DataFrame:
    """Append a model score column via Arrow-batched inference.

    ``score_fn(pd.Series of text) -> pd.Series of double`` is one
    model/HTTP call per Arrow batch in production.
    """
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.dtypes] + [f"{score_col} double"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[score_col] = score_fn(pdf[text_col]).astype("float64")
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def stub_translate(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for the translation service
    (broken_site_report_ml/main.py translate batch calls): reverses
    word order — clearly fake, trivially checkable, exp-free."""
    return texts.map(lambda t: " ".join(reversed(t.split(" "))))


def batched_transform(
    df: DataFrame,
    text_col: str,
    transform_fn: Callable[[pd.Series], pd.Series] = stub_translate,
    out_col: str = "translated",
) -> DataFrame:
    """String→string batched model call (the translation shape of F8,
    alongside ``batched_inference``'s scoring shape): one service
    call per Arrow batch, output aligned 1:1."""
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.dtypes] + [f"{out_col} string"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = transform_fn(pdf[text_col]).astype("object")
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def hashed_linear_scores(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = 1024,
    weights: list[float] | None = None,
    weight_scale: int = 1000,
) -> DataFrame:
    """fastText-style linear text classifier applied ENTIRELY
    JVM-side — the inference fast path that needs no Arrow stage at
    all (the complement of :func:`batched_inference`, which exists
    for remote/heavyweight models).

    The hashing trick: token -> md5 -> first 8 hex chars -> bucket in
    [0, n_buckets); the model is one weight per bucket, shipped into
    the plan as a single SQL array literal (the `_matrix_literal`
    lesson: one expression, not n_buckets py4j calls) and indexed by
    ``element_at`` — per token that is a hash + one array lookup, no
    explode, no join, no shuffle. A linear model over hashed unigrams
    is exactly how production corpus-quality classifiers (fastText,
    CCNet's variants) run at 100 TB: the whole scoring pass is
    map-side and pipelines into whatever shuffle follows.

    ``weights``: per-bucket floats; they are quantized to
    floor(w * weight_scale) so the per-document accumulation is EXACT
    integer math (engine-portable, order-independent — the x22
    recipe). Default (None): deterministic pseudo-weights
    w_int(b) = ((b * 2654435761) mod 2001) - 1000 — a stand-in model
    that exercises the full plumbing and lets the DuckDB oracle
    replay scoring bit-for-bit; swap in trained weights without
    changing the plan shape.

    Output: id_cols + (n_tokens bigint, score_sum bigint,
    mean_score double) — mean_score is score_sum / (weight_scale *
    n_tokens), the single IEEE division at the edge.
    """
    from pyspark.sql import functions as F

    if weights is not None:
        if len(weights) != n_buckets:
            raise ValueError(
                f"weights has {len(weights)} entries for {n_buckets} buckets"
            )
        ints = [int(math.floor(w * weight_scale)) for w in weights]
        w_lit = F.expr(
            "array(" + ",".join(f"{v}L" for v in ints) + ")"
        )
        bucket_weight = lambda b: F.element_at(w_lit, (b + 1).cast("int"))  # noqa: E731
    else:
        def bucket_weight(b):
            return F.pmod(b * F.lit(2654435761), F.lit(2001)) - F.lit(1000)

    toks = F.split(F.lower(F.col(text_col)), " ")
    bucket = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    per_tok = F.transform(toks, lambda t: bucket_weight(bucket(t)).cast("bigint"))
    score_sum = F.aggregate(
        per_tok, F.lit(0).cast("bigint"), lambda a, v: a + v
    )
    n_tokens = F.size(toks).cast("bigint")
    scored = df.select(
        *id_cols,
        n_tokens.alias("n_tokens"),
        score_sum.alias("score_sum"),
    )
    return scored.withColumn(
        "mean_score",
        F.col("score_sum").cast("double")
        / (F.lit(float(weight_scale)) * F.col("n_tokens").cast("double")),
    )
