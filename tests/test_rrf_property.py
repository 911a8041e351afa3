"""Property-based RRF fusion parity vs a pure-Python model.

rank_signal + rrf_fuse promise: deterministic ranks under
(score DESC, id ASC) ties, per-signal fixed-point contribution
round(w/(rank+60) * 1e12), exact integer summation across signals,
and top-k under (rrf_score DESC, id ASC). Random score tables with
deliberate duplicate scores exercise the tie-break and
missing-from-a-signal paths the fixed oracle data rarely stresses.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.operators import rrf as rrf_op

# (id, score) lists; scores from a tiny set to force plenty of ties
signal_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.sampled_from([0.1, 0.25, 0.5, 0.5, 0.9]),
    min_size=1,
    max_size=8,
)


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def model_fuse(sig_a: dict[int, float], sig_b: dict[int, float], wa: float, wb: float):
    def ranks(sig):
        ordered = sorted(sig.items(), key=lambda kv: (-kv[1], kv[0]))
        return {i: r + 1 for r, (i, _) in enumerate(ordered)}

    ra, rb = ranks(sig_a), ranks(sig_b)
    scale = float(10**rrf_op.SCORE_SCALE)
    out = {}
    for i in set(ra) | set(rb):
        c = 0
        if i in ra:
            c += _round_half_up(wa / (ra[i] + rrf_op.RRF_K) * scale)
        if i in rb:
            c += _round_half_up(wb / (rb[i] + rrf_op.RRF_K) * scale)
        out[i] = c / scale
    return out, ra, rb


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(sig_a=signal_strategy, sig_b=signal_strategy)
def test_rrf_fuse_matches_model(spark, sig_a, sig_b):
    wa, wb = 0.7, 0.3
    df_a = spark.createDataFrame(sorted(sig_a.items()), "id long, score double")
    df_b = spark.createDataFrame(sorted(sig_b.items()), "id long, score double")
    fused = rrf_op.rrf_fuse(
        {
            "a": (rrf_op.rank_signal(df_a, "id", "score"), wa),
            "b": (rrf_op.rank_signal(df_b, "id", "score"), wb),
        }
    ).collect()
    want_scores, ra, rb = model_fuse(sig_a, sig_b, wa, wb)
    got_scores = {int(r.id): float(r.rrf_score) for r in fused}
    assert got_scores == want_scores
    for r in fused:
        assert (None if r.a_rank is None else int(r.a_rank)) == ra.get(int(r.id))
        assert (None if r.b_rank is None else int(r.b_rank)) == rb.get(int(r.id))
