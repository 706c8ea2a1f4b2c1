"""EtlJob framework: registry + CLI + dry-run (SURVEY.md §3.1, §2.10 D5/D6).

The reference's job lifecycle (webcompat_kb/main.py:37-64 + base.py):
EtlJob subclasses self-register into ALL_JOBS at import time; a CLI
builds subcommands from the registry; every job gets a --write gate
(dry-run default in spirit) and idempotency guards.

Engine version: ``EtlJob`` subclasses register via
``__init_subclass__``; ``main()`` exposes ``list`` and ``run <job>``
with --sf-dir/--out/--write; jobs receive a configured SparkSession
and the write gate. Two demo jobs wire the registry to real engine
operators so the CLI is a working end-to-end surface.
"""

from __future__ import annotations

import argparse
import logging
import sys
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docker_etl_spark.session import get_spark
from docker_etl_spark.sources.io import load_table, write_table

log = logging.getLogger(__name__)

ALL_JOBS: dict[str, type["EtlJob"]] = {}


@dataclass
class JobContext:
    spark: SparkSession
    sf_dir: str
    out: str | None
    write: bool


class EtlJob:
    """Base job. Subclasses set ``name`` and implement ``run``."""

    name: str = ""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if cls.name:
            ALL_JOBS[cls.name] = cls

    def run(self, ctx: JobContext) -> DataFrame | None:  # pragma: no cover
        raise NotImplementedError


class MonthlyRevenueJob(EtlJob):
    """Demo: monthly revenue rollup → partitioned parquet (D1/D3)."""

    name = "monthly_revenue"

    def run(self, ctx: JobContext) -> DataFrame:
        from docker_etl_spark.queries import QUERIES

        df = QUERIES["a15_monthly_revenue"](ctx.spark, ctx.sf_dir)
        if ctx.out:
            write_table(
                df.withColumn("ym", df["ship_month"].substr(1, 7)),
                ctx.out,
                mode="overwrite",
                partition_by=["ym"],
                write=ctx.write,
            )
        return df


class NearDupReportJob(EtlJob):
    """Demo: MinHash-LSH near-duplicate report over documents."""

    name = "near_dup_report"

    def run(self, ctx: JobContext) -> DataFrame:
        from docker_etl_spark.operators.text_dedup import minhash_near_duplicates

        docs = load_table(ctx.spark, ctx.sf_dir, "documents")
        pairs = minhash_near_duplicates(docs, num_perm=64, bands=8, threshold=0.8)
        if ctx.out:
            write_table(pairs, ctx.out, mode="overwrite", write=ctx.write)
        return pairs


class DashboardSnapshotJob(EtlJob):
    """Graphics-dashboard lifecycle (§3.2): long-format union query →
    driver-side reshape (KB-scale) → JSON blob snapshot (S9) with
    atomic swap. Mirrors dashboard.py reshape + common.py:75-104
    upload; the blob root is ``--out``."""

    name = "dashboard_snapshot"

    def run(self, ctx: JobContext) -> DataFrame:
        from docker_etl_spark.queries import QUERIES
        from docker_etl_spark.sources.adapters import JsonBlobStore

        df = QUERIES["gd01_dashboard_union"](ctx.spark, ctx.sf_dir)
        if ctx.out and ctx.write:
            # KB-scale by design (post-aggregation long-format rows);
            # limit(N+1) makes the contract enforceable without a
            # second full pass over the plan.
            max_rows = 1_000_000
            rows = [r.asDict() for r in df.limit(max_rows + 1).collect()]
            if len(rows) > max_rows:
                raise ValueError(
                    f"dashboard snapshot exceeds {max_rows} rows; "
                    "driver-side reshape is for post-aggregation output only"
                )
            snapshot: dict[str, dict] = {}
            for r in rows:
                snapshot.setdefault(r["output"], {})[
                    "|".join(filter(None, [r["key"], r["subkey"]])) or "_"
                ] = r["value"]
            JsonBlobStore(ctx.out).upload("dashboard", snapshot)
        return df


class SearchAlertJob(EtlJob):
    """Search-alert lifecycle: anomaly rule query → append only the
    non-normal rows (the alert records table; main.py:306-313)."""

    name = "search_alert"

    def run(self, ctx: JobContext) -> DataFrame:
        from docker_etl_spark.queries import QUERIES

        alerts = QUERIES["an01_search_anomaly_rules"](ctx.spark, ctx.sf_dir).filter(
            "severity <> 'normal'"
        )
        if ctx.out:
            write_table(alerts, ctx.out, mode="append", write=ctx.write)
        return alerts


class CorpusPrepJob(EtlJob):
    """End-to-end training-corpus curation: quality gate (Gopher
    rules) → exact content dedup (min doc_id per md5 survives) →
    per-domain quota cap → deterministic train/val/test split;
    writes the curated corpus partitioned by split (so downstream
    training readers prune to their split at the scan), returns the
    per-(split, source) census for display."""

    name = "corpus_prep"

    def run(self, ctx: JobContext) -> DataFrame:
        from pyspark.sql import Window

        from docker_etl_spark.operators.corpus import (
            domain_cap,
            gopher_quality,
            hash_split,
        )

        docs = load_table(ctx.spark, ctx.sf_dir, "documents")
        kept = docs.filter(gopher_quality("text", min_words=5, min_stopwords=1)["keep"])
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        deduped = (
            kept.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
        )
        capped = domain_cap(deduped, "source", cap=100_000)
        curated = hash_split(capped)
        if ctx.out:
            write_table(
                curated,
                ctx.out,
                mode="overwrite",
                partition_by=["split"],
                write=ctx.write,
            )
        return curated.groupBy("split", "source").agg(
            F.count("*").cast("long").alias("n_docs")
        )


class SchemaUpdateJob(EtlJob):
    """Schema deployment lifecycle (reference UpdateSchemaJob,
    etl/update_schema.py:625-682): load the file project, diff the
    template tree hash against the last recorded deployment, and
    deploy only changed objects + their dependents. ``--out``
    overrides the project root (defaults to the demo project). In
    dry-run (no ``--write``) the changed set is reported but nothing
    deploys. Returns one row per would-be/actually deployed object."""

    name = "update_schema"

    def run(self, ctx: JobContext) -> DataFrame:
        from pathlib import Path

        from docker_etl_spark.plans.projectdata import FileProject, tree_hash

        root = ctx.out or str(
            Path(__file__).resolve().parent.parent / "fixtures" / "demo_project"
        )
        proj = FileProject(
            ctx.spark,
            root,
            table_bindings={
                "analytics.priority_orders": load_table(
                    ctx.spark, ctx.sf_dir, "orders"
                )
            },
            prefix="schemajob_",
        )
        if ctx.write:
            deployed = proj.update_if_needed()
            rows = [(n, "deployed") for n in deployed]
        else:
            last_t, last_h = proj.get_last_update()
            if last_h == tree_hash(root):
                rows = []
            else:
                rows = [
                    (proj.physical_name(d, n), "would-deploy")
                    for d, n in proj.deploy_order()
                    if proj.needs_update(d, n)
                ]
        return ctx.spark.createDataFrame(
            rows or [], "object string, action string"
        )


class KpiForecastJob(EtlJob):
    """kpi-forecasting lifecycle (§3.3): daily metric series per
    segment → per-segment model fit/predict (applyInPandas; the
    cluster parallelizes across segments) → observed+forecast
    combination → WRITE_APPEND, the reference's writeback
    disposition (prophet_forecast.py:357)."""

    name = "kpi_forecast"

    def run(self, ctx: JobContext) -> DataFrame:
        from docker_etl_spark.operators.forecast import fit_predict_segments

        ev = load_table(ctx.spark, ctx.sf_dir, "events")
        daily = ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("ds")
        ).agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("y"))
        fc = fit_predict_segments(
            daily, ["event_type"], date_col="ds", value_col="y", horizon_days=14
        )
        if ctx.out:
            write_table(fc, ctx.out, mode="append", write=ctx.write)
        return fc


JOB_TEMPLATE = '''"""{name} job (generated scaffold — docker-etl-spark new)."""

from pyspark.sql import DataFrame

from docker_etl_spark.jobs import EtlJob, JobContext
from docker_etl_spark.sources.io import load_table, write_table


class {cls}Job(EtlJob):
    """TODO: one-line job description."""

    name = "{name}"

    def run(self, ctx: JobContext) -> DataFrame:
        df = load_table(ctx.spark, ctx.sf_dir, "events")
        # TODO: build the plan (see docker_etl_spark.operators / queries.py)
        if ctx.out:
            write_table(df, ctx.out, mode="overwrite", write=ctx.write)
        return df
'''


def scaffold_job(name: str, directory: str) -> str:
    """Generate a new job module from the template (the reference's
    create_new_job scaffolding, docker_etl/create_new_job.py +
    tests/test_create_new_job.py). Importing the generated module
    registers the job (EtlJob.__init_subclass__)."""
    import os
    import re

    if not re.fullmatch(r"[a-z][a-z0-9_]*", name):
        raise ValueError(f"job name must be snake_case, got {name!r}")
    cls = "".join(part.capitalize() for part in name.split("_"))
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.py")
    if os.path.exists(path):
        raise FileExistsError(path)
    with open(path, "w", encoding="utf-8") as f:
        f.write(JOB_TEMPLATE.format(name=name, cls=cls))
    return path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="docker-etl-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered jobs")
    newp = sub.add_parser("new", help="scaffold a new job module")
    newp.add_argument("name")
    newp.add_argument("--dir", default="jobs_local")
    runp = sub.add_parser("run", help="run a job")
    runp.add_argument("job", choices=sorted(ALL_JOBS))
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--out", default=None)
    runp.add_argument(
        "--write",
        action="store_true",
        help="actually write outputs (default: dry-run, like the reference's --write gate)",
    )
    runp.add_argument("--show", type=int, default=5, help="rows to display")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "list":
        for name, cls in sorted(ALL_JOBS.items()):
            print(f"{name}\t{(cls.__doc__ or '').strip().splitlines()[0]}")
        return 0
    if args.cmd == "new":
        print(scaffold_job(args.name, args.dir))
        return 0
    spark = get_spark(app_name=f"docker-etl-spark-{args.job}")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = JobContext(spark, args.sf_dir, args.out, args.write)
    df = ALL_JOBS[args.job]().run(ctx)
    if df is not None and args.show:
        df.show(args.show, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
