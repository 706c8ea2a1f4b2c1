"""Adversarial full-registry differential drive.

The cheap way to catch partition-order and timezone nondeterminism
(verify-skill recipe): run EVERY oracle-paired registry query at the
driver's scale factor (sf0.01) under a deliberately hostile session —
local[3], 7 shuffle partitions, Asia/Kolkata — and compare each
against its DuckDB oracle with the driver's own canonicalization
(row count + schema + order-insensitive value hash).

Usage: python adversarial_check.py [--sf-dir /root/testdata/sf0.01]
Prints one failing line per mismatch and a final JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession  # noqa: E402

from docker_etl_spark.queries import ORACLES, QUERIES  # noqa: E402
from docker_etl_spark.sources.io import TESTDATA_TABLES  # noqa: E402
from tests.oracle import assert_matches_oracle  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[3]")
    ap.add_argument("--shuffle-partitions", default="7")
    ap.add_argument("--timezone", default="Asia/Kolkata")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated name substrings; run only matching queries",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(args.master)
        .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
        .config("spark.sql.session.timeZone", args.timezone)
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    t0 = time.monotonic()
    failures: dict[str, str] = {}
    n = 0
    subs = args.only.split(",") if args.only else None
    for name in sorted(ORACLES):
        if subs is not None and not any(s in name for s in subs):
            continue
        n += 1
        try:
            assert_matches_oracle(
                QUERIES[name](spark, args.sf_dir), con, ORACLES[name], name=name
            )
        except Exception as ex:  # keep probing; report all failures
            failures[name] = str(ex).split("\n")[0][:200]
            print(f"FAIL {name}: {failures[name]}", flush=True)
    print(
        json.dumps(
            {
                "checked": n,
                "failed": len(failures),
                "failures": failures,
                "sf_dir": args.sf_dir,
                "master": args.master,
                "shuffle_partitions": args.shuffle_partitions,
                "timezone": args.timezone,
                "wall_sec": round(time.monotonic() - t0, 1),
            }
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
