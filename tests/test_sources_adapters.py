"""Source-adapter layer (§2.1 S6, S9-S15) and Python DataSource V2
(S2/S10 executor-parallel path)."""

from __future__ import annotations

import sys

import pytest

from docker_etl_spark.sources.adapters import (
    JsonBlobStore,
    TransferTrigger,
    paginated_rest_source,
    rows_to_df,
    sftp_sink,
    subprocess_source,
)
from docker_etl_spark.sources.datasources import (
    PagedApiDataSource,
    QueueDrainDataSource,
    queue_put,
)


def test_rows_to_df_explicit_schema(spark):
    df = rows_to_df(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": None}], "a BIGINT, b STRING")
    assert df.count() == 2
    assert dict(df.dtypes) == {"a": "bigint", "b": "string"}


def test_paginated_rest_source_drains_until_empty(spark):
    calls = []

    def fetch(page: int):
        calls.append(page)
        return [{"id": page * 2 + i} for i in range(2)] if page < 3 else []

    df = paginated_rest_source(spark, fetch, "id BIGINT")
    assert df.count() == 6
    assert calls == [0, 1, 2, 3]  # stops on first empty page


def test_subprocess_source_parses_stdout(spark):
    def parse(out: str):
        for line in out.strip().splitlines():
            k, v = line.split("=")
            yield {"slot": k, "value": int(v)}

    df = subprocess_source(
        spark,
        [sys.executable, "-c", "print('a=1'); print('b=2')"],
        parse,
        "slot STRING, value BIGINT",
    )
    assert sorted(tuple(r) for r in df.collect()) == [("a", 1), ("b", 2)]


def test_json_blob_store_roundtrip_and_trend_merge(tmp_path):
    store = JsonBlobStore(str(tmp_path))
    store.upload("snap", [{"week": "2026-01-04", "n": 1}])
    assert store.download("snap") == [{"week": "2026-01-04", "n": 1}]
    assert store.download("missing", default=[]) == []
    merged = store.merge_cached_trend(
        "snap",
        [{"week": "2026-01-04", "n": 9}, {"week": "2026-01-11", "n": 2}],
        key="week",
    )
    # new rows win on collision; history preserved, sorted by key
    assert merged == [{"week": "2026-01-04", "n": 9}, {"week": "2026-01-11", "n": 2}]
    assert store.download("snap") == merged


def test_sftp_sink_is_gated(spark):
    df = rows_to_df(spark, [{"a": 1}], "a BIGINT")
    with pytest.raises(NotImplementedError):
        sftp_sink(df, "host", "/path")


def test_transfer_trigger_polls_to_terminal_state():
    states = iter(["PENDING", "RUNNING", "SUCCEEDED"])
    t = TransferTrigger(
        start_run=lambda day: f"run-{day}",
        poll_state=lambda run_id: next(states),
    )
    assert t.backfill("2026-08-01") == "SUCCEEDED"


def test_paged_api_datasource_parallel_read(spark):
    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .option("fetcher", "demo")
        .option("pages", "8")
        .option("pages_per_partition", "2")
        .schema("id BIGINT, payload STRING")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # 8 pages / 2 per partition
    assert df.count() == 800
    assert df.agg({"id": "max"}).first()[0] == 799


def squares_fetcher(p: int):
    return [(p, p * p)]


def test_paged_api_custom_fetcher(spark):
    # Custom fetchers resolve by dotted path because the reader
    # initializes in a fresh worker process (see datasources.py).
    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .option("fetcher", "tests.test_sources_adapters:squares_fetcher")
        .option("pages", "5")
        .schema("p INT, sq INT")
        .load()
    )
    assert sorted(tuple(r) for r in df.collect()) == [
        (0, 0), (1, 1), (2, 4), (3, 9), (4, 16)
    ]


def test_queue_drain_stream_reads_pending(spark, tmp_path):
    spark.dataSource.register(QueueDrainDataSource)
    spool = str(tmp_path / "spool.jsonl")
    queue_put(spool, [(1, "taskA"), (2, "taskB")])
    stream = (
        spark.readStream.format("queue_drain")
        .option("path", spool)
        .schema("run_id INT, task STRING")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t3q_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM t3q_sink").collect()
    assert sorted(tuple(r) for r in rows) == [(1, "taskA"), (2, "taskB")]
