"""Shared-store write discipline: single-writer lease + compaction.

The incremental digest/signature/vector stores
(operators/dedupe.write_digest_store, text_dedup.write_signature_store,
similarity.write_vector_store) are the engine's only mutable shared
state — plain-parquet append layouts with no table format underneath,
so a second concurrent writer would silently corrupt the directory
listing (half-written part files visible to the other's reads, lost
appends on overwrite races). The reference runs the analogous ledger
tables single-writer too — Airflow serializes its jobs and BigQuery
supplies the transactionality (fxci_etl/loaders/bigquery.py:129-220);
with bare parquet the single-writer assumption must be ENFORCED, not
assumed. :func:`store_writer_lock` is that guard: a sibling lease
file acquired O_CREAT|O_EXCL (atomic on POSIX) around every mutation.

Streaming appends also fragment these stores — one small parquet file
per micro-batch, exactly the read-amplification
:func:`compact_partitioned_store` exists to undo (the read-side twin
of the reference's write-side binpacking caps,
fxci_etl/loaders/bigquery.py:26-28). Compaction preserves the
partition layout (band / tbl / digest_prefix directories) so the
partition-pruned probe plans are unchanged, and sizes itself from
parquet FOOTER metadata — never a full-scan ``count()``.
"""

from __future__ import annotations

import contextlib
import glob
import logging
import os
import shutil
import time
from urllib.parse import urlparse

log = logging.getLogger(__name__)


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted to mutate a single-writer store (or a
    writer found its own lease broken mid-write)."""


def _local_path(path: str) -> str | None:
    """The filesystem path when ``path`` is local, else None (object
    stores have no POSIX O_EXCL; coordination must come from the
    scheduler there, as in the reference's Airflow serialization)."""
    p = urlparse(path)
    if p.scheme in ("", "file"):
        return p.path or path
    return None


def _lock_path(store_path: str) -> str:
    return store_path.rstrip("/") + ".__writer_lock"


@contextlib.contextmanager
def store_writer_lock(
    store_path: str,
    owner: str | None = None,
    stale_after_sec: float | None = None,
):
    """Single-writer lease around a store mutation.

    Acquire is an atomic ``O_CREAT|O_EXCL`` create of a sibling lease
    file recording (owner, pid, epoch). A second writer arriving while
    the lease exists raises :class:`ConcurrentWriteError` LOUDLY —
    never waits, never proceeds. ``stale_after_sec`` lets a new writer
    break a lease older than the given age (a crashed writer's
    leftover); the breaker logs the takeover. On release the lease
    content is verified: if it no longer matches this writer's token,
    someone broke the lease and wrote concurrently — the original
    writer ALSO fails loudly rather than reporting success over a
    possibly-interleaved store.

    Non-local store paths skip the lease (no POSIX semantics there);
    the caller's scheduler must serialize writers, and the skip is
    logged at debug so the assumption is visible.
    """
    local = _local_path(store_path)
    if local is None:
        log.debug(
            "store_writer_lock: %s is not a local path; relying on external "
            "writer serialization",
            store_path,
        )
        yield
        return
    lock = _lock_path(local)
    os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)
    token = f"{owner or 'writer'} pid={os.getpid()} t={time.time():.6f}"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        holder = "<unreadable>"
        age = None
        try:
            with open(lock) as f:
                holder = f.read().strip()
            age = time.time() - os.path.getmtime(lock)
        except OSError:
            pass
        if stale_after_sec is not None and age is not None and age > stale_after_sec:
            log.warning(
                "store_writer_lock: breaking stale lease on %s (holder %r, "
                "age %.0fs > %.0fs)",
                store_path,
                holder,
                age,
                stale_after_sec,
            )
            os.unlink(lock)
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        else:
            raise ConcurrentWriteError(
                f"store {store_path} is locked by another writer ({holder}); "
                "the incremental stores are single-writer — serialize "
                "mutations (or pass stale_after_sec to break an abandoned "
                "lease)"
            )
    with os.fdopen(fd, "w") as f:
        f.write(token)
    try:
        yield
    finally:
        current = None
        with contextlib.suppress(OSError):
            with open(lock) as f:
                current = f.read()
        if current != token:
            raise ConcurrentWriteError(
                f"lease on {store_path} was broken mid-write (now held by "
                f"{current!r}); this writer's mutations may have interleaved "
                "with another's — verify the store before further appends"
            )
        with contextlib.suppress(OSError):
            os.unlink(lock)


def parquet_row_count(path: str) -> int | None:
    """Total rows of a parquet file/directory from FOOTER metadata
    only — no Spark job, no data pages read. Returns None when the
    path is not locally walkable (caller falls back to a scan)."""
    local = _local_path(path)
    if local is None or not os.path.exists(local):
        return None
    if os.path.isfile(local):
        files = [local]
    else:
        files = [
            os.path.join(root, fn)
            for root, _dirs, fns in os.walk(local)
            for fn in fns
            if fn.endswith(".parquet")
        ]
    if not files:
        return 0
    try:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:  # pragma: no cover - pyarrow always present here
        return None


def parquet_file_count(path: str) -> int | None:
    """Data-file count of a local parquet layout (compaction metric)."""
    local = _local_path(path)
    if local is None or not os.path.exists(local):
        return None
    return sum(
        1
        for root, _dirs, fns in os.walk(local)
        for fn in fns
        if fn.endswith(".parquet")
    )


def compact_partitioned_store(
    spark,
    path: str,
    partition_cols: tuple[str, ...],
    target_rows_per_file: int = 1_000_000,
    owner: str | None = None,
) -> dict:
    """Rewrite a partitioned parquet store into right-sized files,
    PRESERVING the partition directory layout (band=…/, tbl=…/,
    digest_prefix=…/) so partition-pruned probe plans are untouched.

    Streaming appends leave one small file per micro-batch per
    partition; after N batches a band probe reads N footers per
    directory. The rewrite is one hash repartition on the partition
    columns (each partition value lands in exactly one task → one
    right-sized file per directory, ``maxRecordsPerFile`` splitting
    oversize ones) — fully distributed, no driver data.

    Swap discipline: the compacted copy is written to a sibling temp
    dir, the live store is renamed to a ``.bak``, the temp renamed
    live, and the backup removed — so a crash leaves either the old
    store or the new one, never a half-compacted mix. The writer
    lease is held across the whole swap (compaction IS a store
    mutation).

    Sizing comes from :func:`parquet_row_count` (footer metadata, no
    scan). Returns {"rows", "files_before", "files_after"}.
    """
    local = _local_path(path)
    if local is None:
        raise ValueError(
            "compact_partitioned_store requires a local store path; object-"
            "store layouts need a table format (Delta/Iceberg) for safe swaps"
        )
    with store_writer_lock(path, owner=owner or "compact"):
        files_before = parquet_file_count(local) or 0
        rows = parquet_row_count(local)
        df = spark.read.parquet(local)
        tmp = local.rstrip("/") + ".__compact"
        bak = local.rstrip("/") + ".__bak"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            df.repartition(*[str(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .option("maxRecordsPerFile", target_rows_per_file)
            .parquet(tmp)
        )
        shutil.rmtree(bak, ignore_errors=True)
        os.rename(local, bak)
        os.rename(tmp, local)
        shutil.rmtree(bak)
        files_after = parquet_file_count(local) or 0
    # Spark caches file listings per path string in some plans; make
    # sure later reads observe the swapped directory.
    spark.catalog.clearCache()
    return {"rows": rows, "files_before": files_before, "files_after": files_after}


def parquet_path_exists(spark, path: str) -> bool:
    """Scheme-agnostic existence check via the Hadoop FileSystem —
    the narrow 'first batch: no store yet' test the streaming sinks
    need instead of a catch-all around the read (ADVICE r5: a bare
    except around the store read turned transient read errors into
    silent dedup bypass)."""
    local = _local_path(path)
    if local is not None:
        return os.path.exists(local)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))
