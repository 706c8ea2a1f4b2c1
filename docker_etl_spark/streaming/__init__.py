"""Structured Streaming layer (SURVEY.md §2.11 T1-T8)."""

from docker_etl_spark.streaming.core import (  # noqa: F401
    cdc_chunk_dedup_stream,
    cms_sketch_stream,
    corpus_filter_stream,
    curation_stream,
    drain_available,
    embedding_dedup_stream,
    file_stream,
    foreach_batch_with_dead_letter,
    ivfpq_index_stream,
    minhash_dedup_stream,
    psi_gate_stream,
    quantile_rollup_stream,
    search_index_stream,
    streaming_dedupe,
    tumbling_window_agg,
)
