"""Differential-compare helpers mirroring the driver's correctness
check: row count + order-insensitive, column-name-sorted value compare."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from pyspark.sql import DataFrame


def _norm_value(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "__nan__"
    return v


def normalize(rows, colnames):
    """Rows → sorted list of tuples with columns sorted by name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def spark_result(df: DataFrame):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def assert_matches_oracle(df: DataFrame, con, sql: str, name: str = "query"):
    assert_matches_result(df, duck_result(con, sql), name=name)


def assert_matches_result(df: DataFrame, oracle, name: str = "query"):
    """Compare a Spark frame against a PRECOMPUTED (cols, rows) oracle
    result — the prefetch-pool variant of :func:`assert_matches_oracle`
    (same normalization, same assertions)."""
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = oracle
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_norm = normalize(s_rows, s_cols)
    d_norm = normalize(d_rows, d_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
