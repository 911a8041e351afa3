"""Property-based as-of join parity vs a brute-force pure-Python
model on random event sets.

The operator (operators/joins.asof_join) is the union->window form —
one shuffle, zero join operators. The model below is the O(n*m)
definition: for every left row, the right row of the same key with
the largest ts <= left.ts, ties on ts resolved to the largest
tiebreak. Random keys/timestamps hit the shapes the fixed testdata
never does: equal timestamps on both sides, duplicate right rows,
keys with no right rows at all.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.operators.joins import asof_join

BASE = datetime(2024, 1, 1)

# (key, ts_offset_seconds) rows; ids are assigned by list position
left_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=8
)
right_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=0, max_size=8
)


def model_asof(left, right):
    out = {}
    for li, (lk, lts) in enumerate(left):
        cands = [
            (rts, rid) for rid, (rk, rts) in enumerate(right) if rk == lk and rts <= lts
        ]
        out[li] = max(cands)[1] if cands else None  # (ts, tiebreak) max
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=left_strategy, right=right_strategy)
def test_asof_matches_brute_force_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "left_id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(right)]
        or [(99, 99, BASE)],
        "right_id long, k long, ts timestamp",
    )
    if not right:
        rdf = rdf.filter("right_id < 0")
    got = {
        int(r.left_id): (None if r.right_id is None else int(r.right_id))
        for r in asof_join(
            ldf, rdf, key="k", ts="ts", right_vals=["right_id"], tiebreak="right_id"
        ).collect()
    }
    assert got == model_asof(left, right)
