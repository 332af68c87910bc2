"""Every queries() entry must match its oracle_sql() on sf0.001 —
the local replica of the driver's correctness gate (driver runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query


def _pairs():
    from ontoea_spark import driver_queries

    q = driver_queries.queries()
    o = driver_queries.oracle_sql()
    assert set(o) <= set(q), f"oracle without query: {set(o) - set(q)}"
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle(spark, name, fn, sql):
    compare_query(spark, SF_SMOKE, fn, sql)
