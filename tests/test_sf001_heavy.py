"""Driver-scale differential tier for the heavy kernels.

The local suite verifies every oracle at sf0.001 while the driver
replays at sf0.01 — and the planted structures the heavy x-family
kernels exercise (twin pairs, clusters, hot buckets) are RICHER at
sf0.01 (e.g. 25 true near-dup pairs vs a handful). This module runs
exactly the dedup/similarity/corpus kernels against their oracles at
sf0.01, so "green at driver scale" is a local fact, not a prediction.

Marked ``sf001``: deselect with ``-m "not sf001"`` when iterating
(the tier adds ~2-4 minutes; the default full-suite run includes it).
"""

from __future__ import annotations

import pytest

from docker_etl_spark.queries import ORACLES
from tests.conftest import SF_HEAVY
from tests.oracle import assert_matches_result

SF001_DIR = SF_HEAVY

# The kernels whose behaviour actually changes with planted-structure
# density: the full x-family plus the other iterative/heavy ops.
HEAVY = [n for n in sorted(ORACLES) if n.startswith("x")]

pytestmark = pytest.mark.sf001


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_kernel_matches_oracle_at_sf001(qdf, oracle_pool, name):
    df = qdf(name, SF001_DIR, evict=True)
    assert_matches_result(
        df, oracle_pool.result(SF001_DIR, name), name=name
    )
