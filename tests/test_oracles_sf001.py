"""Oracle comparison at sf0.01 — the exact scale the driver verifies at.

Marked slow-ish; still required green before every commit touching
queries/oracles.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare_query


def _pairs():
    from ontoea_spark import driver_queries

    q = driver_queries.queries()
    o = driver_queries.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_sf001(spark, name, fn, sql):
    compare_query(spark, SF_CORRECT, fn, sql)
