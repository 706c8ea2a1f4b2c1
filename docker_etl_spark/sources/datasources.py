"""Python DataSource V2 sources (SURVEY.md §2.1 S2/S10 — the
executor-parallel path).

The reference ingests APIs and message queues on the driver (S10
REST loops; S2 kombu AMQP drain, fxci_etl/pulse/consume.py:8-60).
Spark 4's Python data source API moves that work onto executors:
each ``InputPartition`` fetches its own slice, so a page-addressable
API ingests with cluster parallelism and restarts recover per
partition — the 100 TB formulation of "call the API in a loop".

Two sources:

- ``PagedApiDataSource`` (batch): one partition per page range.
  The page fetcher is resolved from a registry by name (options are
  strings; callables cannot ship through them) — production
  registers a requests-based fetcher, tests register fakes.
- ``QueueDrainDataSource`` (streaming): SimpleDataSourceStreamReader
  with drain-until-quiet semantics (T1): each microbatch reads
  whatever the queue holds; an empty read is a no-op batch. The
  queue is injected via registry the same way.

Use:
    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .option("fetcher", "demo").option("pages", "8")
          .schema("id BIGINT, payload STRING").load())
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

# Name → fetcher(page:int) -> list[tuple]. NOTE: the reader is
# constructed in a fresh Python worker that re-imports this module,
# so only fetchers registered at import time are visible by bare
# name. Anything else must be passed as a dotted "module:attr" path
# (resolved by import worker-side) — the same pattern JVM sources
# use for class-name options.
PAGE_FETCHERS: dict[str, Callable[[int], list[tuple[Any, ...]]]] = {}


def register_page_fetcher(
    name: str, fn: Callable[[int], list[tuple[Any, ...]]]
) -> None:
    PAGE_FETCHERS[name] = fn


def demo_pages(page: int) -> list[tuple[int, str]]:
    """Deterministic synthetic pages (100 rows/page)."""
    return [(page * 100 + i, f"payload-{page}-{i}") for i in range(100)]


register_page_fetcher("demo", demo_pages)


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _PagedApiReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        spec = options.get("fetcher", "demo")
        if ":" in spec:  # dotted-path fetcher: "pkg.mod:fn"
            import importlib

            mod, attr = spec.split(":", 1)
            self.fetch = getattr(importlib.import_module(mod), attr)
        else:
            self.fetch = PAGE_FETCHERS[spec]
        self.pages = int(options.get("pages", "1"))
        self.pages_per_partition = int(options.get("pages_per_partition", "1"))

    def partitions(self) -> list[InputPartition]:
        step = self.pages_per_partition
        return [
            _PageRange(p, min(p + step, self.pages))
            for p in range(0, self.pages, step)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple[Any, ...]]:
        for page in range(partition.start, partition.end):
            yield from self.fetch(page)


class PagedApiDataSource(DataSource):
    """spark.read.format("paged_api") — executor-parallel paginated
    API scan; schema is caller-declared (API payloads never trust
    inference)."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def reader(self, schema) -> DataSourceReader:
        return _PagedApiReader(self.options)


# --------------------------------------------------------------------------
# Streaming: drain-until-quiet queue source (T1/S2)
# --------------------------------------------------------------------------

def queue_put(spool_path: str, rows: list[tuple[Any, ...]]) -> None:
    """Producer side: append rows (JSON lines) to the spool. Durable
    and cross-process — the stream reader runs in its own Python
    worker, so an in-memory queue would never be visible to it."""
    import json
    import os

    os.makedirs(os.path.dirname(spool_path) or ".", exist_ok=True)
    with open(spool_path, "a", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(list(r)) + "\n")


def _read_spool(spool_path: str) -> list[tuple[Any, ...]]:
    import json

    try:
        with open(spool_path, encoding="utf-8") as f:
            return [tuple(json.loads(line)) for line in f if line.strip()]
    except FileNotFoundError:
        return []


class QueueDrainDataSource(DataSource):
    """spark.readStream.format("queue_drain") — each microbatch takes
    everything currently pending in a spool (the pulse consumer's
    drain semantics, consume.py:47-60: stop when nothing is pending;
    run with Trigger.AvailableNow for T1's drain-and-stop shape).
    Offsets are cumulative row counts, so checkpoint recovery replays
    from the high-water mark."""

    @classmethod
    def name(cls) -> str:
        return "queue_drain"

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        spool = self.options["path"]

        class _Reader(SimpleDataSourceStreamReader):
            def initialOffset(self) -> dict:
                return {"offset": 0}

            def read(self, start: dict):
                q = _read_spool(spool)
                end = {"offset": len(q)}
                return iter(q[start["offset"]:]), end

            def readBetweenOffsets(self, start: dict, end: dict):
                q = _read_spool(spool)
                return iter(q[start["offset"]:end["offset"]])

        return _Reader()
