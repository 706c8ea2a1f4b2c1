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
