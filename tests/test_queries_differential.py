"""Differential tests: every registry query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (sf0.01 there, sf0.001
here for speed) so a green run locally predicts a green
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from docker_etl_spark.queries import ORACLES, QUERIES
from tests.oracle import assert_matches_oracle

ORACLE_QUERIES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.columns
