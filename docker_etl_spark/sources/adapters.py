"""Driver-side source/sink adapters (SURVEY.md §2.1 S6, S9-S15).

The reference's long tail of ingestion is driver-process code: REST
APIs with pagination (S10: etl/bugzilla.py:511-569 bz_fetch_bugs,
quicksuggest2bq/main.py:78-128 Kinto, influxdb_to_bigquery/main.py:
9-43), web scraping (S11), a per-interval subprocess collector (S12:
dap_collector/main.py:33-118), object-store JSON snapshot caches
(S9: graphics_dashboard/common.py:75-104), SFTP delivery (S13), and
managed-transfer triggers (S14: play_store_export/export.py:27-90).

Engine stance: these stay *adapters at the edge* — small driver-side
fetch loops that land rows into ``spark.createDataFrame`` (or read
executor-side via the Python DataSource V2 in ``datasources.py``
when volume warrants). Network/binary dependencies are injected so
the adapters are testable here and swappable in production; anything
whose client library is absent in this container degrades to a
clearly-marked NotImplementedError.
"""

from __future__ import annotations

import json
import os
import subprocess
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def rows_to_df(
    spark: SparkSession, rows: Iterable[dict[str, Any]], schema: str
) -> DataFrame:
    """Driver-side ingestion core (S6/S10): materialized rows →
    DataFrame under an explicit DDL schema (inference is never
    trusted for API payloads)."""
    return spark.createDataFrame(list(rows), schema=schema)


def paginated_rest_source(
    spark: SparkSession,
    fetch_page: Callable[[int], list[dict[str, Any]]],
    schema: str,
    max_pages: int = 10_000,
) -> DataFrame:
    """Paginated REST API source (S10): drain pages until empty.

    ``fetch_page(page_index) -> rows`` is injected (a requests-based
    closure in production; a fake in tests) — mirrors the reference's
    offset-batched Bugzilla fetch (etl/bugzilla.py:511-569: loop
    until fewer than batch-size results).

    Scale note: this is the *driver-side* path for small/medium
    feeds; executor-parallel ingestion of a page-addressable API is
    ``datasources.paged_api_datasource`` (Python DataSource V2).
    """
    out: list[dict[str, Any]] = []
    for page in range(max_pages):
        rows = fetch_page(page)
        if not rows:
            break
        out.extend(rows)
    return rows_to_df(spark, out, schema)


def subprocess_source(
    spark: SparkSession,
    argv: list[str],
    parse_stdout: Callable[[str], Iterator[dict[str, Any]]],
    schema: str,
    timeout_s: float = 100.0,
) -> DataFrame:
    """Subprocess collector source (S12): run a binary, parse stdout
    rows (dap_collector/main.py:33-118 Janus ``collect``; 100 s
    per-slot timeout mirrored as the default)."""
    proc = subprocess.run(
        argv, capture_output=True, text=True, timeout=timeout_s, check=True
    )
    return rows_to_df(spark, parse_stdout(proc.stdout), schema)


@dataclass
class JsonBlobStore:
    """Object-store JSON snapshot cache (S9) — the graphics-dashboard
    GCS blob pattern (common.py:75-104) over an injected root (a
    local directory here; a gcs/s3 fuse mount or client in
    production). Driver-side by design: these blobs are KB-scale
    dashboard snapshots, not data-plane tables."""

    root: str

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def upload(self, name: str, payload: Any) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path(name) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f, sort_keys=True)
        os.replace(tmp, self._path(name))  # atomic snapshot swap

    def download(self, name: str, default: Any = None) -> Any:
        try:
            with open(self._path(name), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return default

    def merge_cached_trend(
        self, name: str, new_rows: list[dict], key: str
    ) -> list[dict]:
        """The trends merge-with-cache step (trends.py:111-128):
        splice newly computed complete periods into cached history —
        new rows win on key collision, order by key."""
        cached = {r[key]: r for r in (self.download(name) or [])}
        cached.update({r[key]: r for r in new_rows})
        merged = [cached[k] for k in sorted(cached)]
        self.upload(name, merged)
        return merged


def sftp_sink(
    df: DataFrame,
    host: str,
    path: str,
    credentials: dict[str, str] | None = None,
) -> None:
    """SFTP delivery sink (S13: jobs/bq2sftp) — extract results and
    push over SFTP without staging. No SFTP client library ships in
    this container; the adapter is the documented seam."""
    try:
        import paramiko  # type: ignore  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no paramiko here
        raise NotImplementedError(
            "sftp_sink requires an SFTP client (paramiko); install it or "
            "deliver via object store + transfer service"
        ) from exc
    raise NotImplementedError("wire paramiko SFTPClient.putfo here")  # pragma: no cover


@dataclass
class TransferTrigger:
    """Managed-transfer orchestration (S14: play_store_export/
    export.py:27-90 — trigger a BigQuery Data Transfer backfill, one
    run per day, await completion). Not an engine operator: the
    engine only records intent and polls the injected service."""

    start_run: Callable[[str], str]
    poll_state: Callable[[str], str]
    max_polls: int = 60

    def backfill(self, day: str) -> str:
        run_id = self.start_run(day)
        for _ in range(self.max_polls):
            state = self.poll_state(run_id)
            if state in ("SUCCEEDED", "FAILED", "CANCELLED"):
                return state
        return "TIMEOUT"
