"""Every registered query must match its DuckDB oracle at sf0.001.

This is the local twin of the driver's CORRECTNESS gate (which runs
at sf0.01); a failure here means a failure there.
"""

from __future__ import annotations

import pytest

from memories_spark.plans.registry import QUERIES
from tests.parity import compare

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


NO_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
