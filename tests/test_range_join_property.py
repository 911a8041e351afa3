"""Property-based bucketed range join parity vs brute force.

The operator rewrites point-in-interval containment as an equi-join
on (key, time bucket); the rewrite's claim — every qualifying pair
appears exactly once, none are lost across bucket boundaries — is
exactly the kind of invariant random inputs break if the bucket math
is off by one. The model is the O(n*m) definition.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.operators.joins import bucketed_range_join

BASE = datetime(2024, 1, 1)
WIDTH_S = 60  # bucket width; intervals below never exceed it

point_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)), min_size=1, max_size=10
)
# (key, start_offset_s, length_s) with length <= bucket width
interval_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300), st.integers(0, WIDTH_S)),
    min_size=1,
    max_size=8,
)


def model_pairs(points, intervals):
    out = set()
    for pid, (pk, ps) in enumerate(points):
        for iid, (ik, s, ln) in enumerate(intervals):
            if pk == ik and s <= ps < s + ln:
                out.add((iid, pid))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(points=point_strategy, intervals=interval_strategy)
def test_bucketed_range_join_matches_brute_force(spark, points, intervals):
    pts = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(points)],
        "point_id long, k long, pts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (i, k, BASE + timedelta(seconds=s), BASE + timedelta(seconds=s + ln))
            for i, (k, s, ln) in enumerate(intervals)
        ],
        "interval_id long, k long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (int(r.interval_id), int(r.point_id))
        for r in bucketed_range_join(
            pts,
            ivs,
            key="k",
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bucket_width_s=WIDTH_S,
        ).collect()
    }
    assert got == model_pairs(points, intervals)
