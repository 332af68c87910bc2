"""Oracle comparison at sf0.01 — the exact scale the driver verifies at.

OPT-IN (set ONTOEA_DRIVER_SCALE_ORACLES=1): the driver itself hash-checks
every oracle at sf0.01 each round and tests/test_oracles.py runs the
same comparisons at sf0.001 in the default suite, so this module
duplicates both signals at 10x the data — it pushed the default suite
past its 600 s budget (VERDICT r4 #4). Run it before shipping changes
to queries/oracles that are sensitive to data scale (new aggregations,
rounding boundaries, skew-dependent plans).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare_query

pytestmark = pytest.mark.skipif(
    not os.environ.get("ONTOEA_DRIVER_SCALE_ORACLES"),
    reason="driver-scale oracle mirror is opt-in (driver + sf0.001 suite "
    "cover the same signal); set ONTOEA_DRIVER_SCALE_ORACLES=1",
)


def _pairs():
    from ontoea_spark import driver_queries

    q = driver_queries.queries()
    o = driver_queries.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_sf001(spark, name, fn, sql):
    compare_query(spark, SF_CORRECT, fn, sql)
