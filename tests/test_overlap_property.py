"""Property tests: bucketed interval-overlap join vs brute force, and
the histogram-quantile error bound.

The overlap join's bucket rewrite must find EXACTLY the pairs the
naive double-inequality scan finds, for any interval layout and any
bucket width — including intervals far longer than the bucket (multi-
bucket coverage) and degenerate zero-length ones. The histogram
estimate's upper-edge must never undershoot the exact nearest-rank
value and can overshoot by at most one bin width.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.operators.joins import bucketed_interval_overlap_join

BASE = datetime(2024, 1, 1)

interval_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=7200),   # start offset s
        st.integers(min_value=1, max_value=5400),   # duration s
    ),
    min_size=1,
    max_size=10,
)


def _mk(rows, id_prefix):
    return [
        (k, i, BASE + timedelta(seconds=s), BASE + timedelta(seconds=s + d))
        for i, (k, s, d) in enumerate(rows)
    ]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=interval_strategy, right=interval_strategy, width=st.sampled_from([60, 600, 1800]))
def test_overlap_join_matches_brute_force(spark, left, right, width):
    lrows = _mk(left, "a")
    rrows = _mk(right, "b")
    ldf = spark.createDataFrame(
        lrows, "k long, a_id long, a_start timestamp, a_end timestamp"
    )
    rdf = spark.createDataFrame(
        rrows, "k long, b_id long, b_start timestamp, b_end timestamp"
    )
    got = {
        (r.k, r.a_id, r.b_id)
        for r in bucketed_interval_overlap_join(
            ldf, rdf, key="k",
            l_start="a_start", l_end="a_end",
            r_start="b_start", r_end="b_end",
            bucket_width_s=width,
        ).collect()
    }
    want = {
        (lk, aid, bid)
        for lk, aid, als, ale in lrows
        for rk, bid, brs, bre in rrows
        if lk == rk and als < bre and brs < ale
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False, width=32),
        min_size=2,
        max_size=200,
    ).filter(lambda v: max(v) > min(v)),
    q=st.sampled_from([0.5, 0.9, 0.99]),
)
def test_histogram_quantile_error_bound(vals, q):
    """Pure-model check of the estimator math shared by the batch
    query and the streaming sink: upper-edge >= exact nearest-rank
    value, overshoot <= one bin width."""
    import math

    nbins = 128
    lo, hi = min(vals), max(vals)
    width = (hi - lo) / nbins
    target = math.ceil(q * len(vals))
    exact = sorted(vals)[target - 1]
    counts: dict[int, int] = {}
    for v in vals:
        b = min(int((v - lo) // width), nbins - 1)
        counts[b] = counts.get(b, 0) + 1
    cum = 0
    hit = None
    for b in sorted(counts):
        cum += counts[b]
        if cum >= target:
            hit = b
            break
    est = lo + (hit + 1) * width
    assert est >= exact - 1e-9
    assert est - exact <= width + 1e-9
