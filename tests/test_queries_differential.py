"""Differential tests: every registry query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (sf0.01 there, sf0.001
here for speed) so a green run locally predicts a green
CORRECTNESS_r{N}.json. Oracle results come from the session's
background prefetch pool (computed fresh each run, overlapped with
the Spark-side tests); query frames come from the session cache so
the store lifecycles built for the plan pins are not rebuilt here.
"""

from __future__ import annotations

import pytest

from docker_etl_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_result

ORACLE_QUERIES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(qdf, oracle_pool, name):
    df = qdf(name, evict=True)
    assert_matches_result(df, oracle_pool.result(SF_SMOKE, name), name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(qdf, name):
    df = qdf(name, evict=True)
    assert df.count() >= 0
    assert df.columns
