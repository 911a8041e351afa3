"""Partition-independence: the determinism contract holds under any
parallelism.

Every oracle-checked query claims order-independent results (exact
fixed-point sums, pinned tie-breaks). The strongest cheap check: run
a representative slice of the registry under a deliberately weird
shuffle-partition count (7) and assert byte-identical rows vs the
default (32). Catches accidental reliance on partition-local
ordering — float accumulation order, first()-style nondeterminism,
unpinned window ties — before it shows up as a flaky oracle mismatch
on a 1000-executor cluster.
"""

from __future__ import annotations

import pytest

from memories_spark.plans.registry import QUERIES

# one representative per family: agg, window, join, graph-iterative,
# sketch, retrieval fusion, dedup pairs, percentile
REPRESENTATIVES = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "hybrid_rrf_5signal",
    "ppr_graph_expand",
    "kmv_distinct_estimate",
    "histogram_quantile_estimate",
    "minhash_near_dups",
    "weekly_retention_cohorts",
    "heavy_hitter_terms_salted",
]


def _rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_identical_across_partitionings(spark, sf_dir, name):
    spec = QUERIES[name]
    base = _rows(spec.fn(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        weird = _rows(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert weird == base
