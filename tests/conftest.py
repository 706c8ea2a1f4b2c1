"""Shared fixtures: one local SparkSession and a DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from docker_etl_spark.session import get_spark
from docker_etl_spark.sources.io import TESTDATA_TABLES

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "sf001: heavy-kernel differential tier at driver scale (sf0.01); "
        'deselect with -m "not sf001" while iterating',
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="docker-etl-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the test tables registered as views —
    the same registration the driver's correctness harness uses."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
