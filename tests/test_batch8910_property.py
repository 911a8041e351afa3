"""Property-based checks for batches 8-10 (randomized inputs vs
pure-Python models): interval-union coverage, sequence patterns,
CUSUM change points, multi-touch attribution conservation, and the
blocked exact set-similarity join.

Reuses the staging helpers from test_advanced_property (symlinked
sf0.001 directory with one table replaced by a generated one).
"""

from __future__ import annotations

import math

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.plans.registry import QUERIES
from tests.test_advanced_property import _events_table, _stage

BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),       # user
        st.integers(0, 40),      # minute offset (dups allowed)
        st.integers(-500, 500),  # value in cents
    ),
    min_size=1,
    max_size=30,
)


# ---------------------------------------------------------------------
# Interval-union coverage == brute-force merged intervals
# ---------------------------------------------------------------------


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=events_strategy)
def test_interval_coverage_matches_model(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("cov")
    d = _stage(tmp, "events", _events_table(rows))
    got = {
        r.user_id: (r.n_islands, r.covered_seconds)
        for r in QUERIES["interval_coverage_union"].fn(spark, d).collect()
    }
    by_user: dict[int, list] = {}
    for _eid, (u, m, v) in enumerate(rows):
        start = (BASE_US + m * 60_000_000) // 1_000_000
        dur = abs(_round_half_up(v / 100.0 * 100.0)) % 1741 + 60
        by_user.setdefault(u, []).append((start, start + dur))
    expect = {}
    for u, ivs in by_user.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expect[u] = (len(islands), sum(e - s for s, e in islands))
    assert got == expect


# ---------------------------------------------------------------------
# Sequence pattern == python regex over the ordered letters
# ---------------------------------------------------------------------

typed_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 40),
        st.sampled_from(["view", "click", "purchase", "signup", "error"]),
    ),
    min_size=1,
    max_size=30,
)


def _typed_events_table(rows):
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [BASE_US + m * 60_000_000 for _, m, _ in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array([t for _, _, t in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=typed_events_strategy)
def test_sequence_pattern_matches_model(spark, tmp_path_factory, rows):
    import re

    tmp = tmp_path_factory.mktemp("seq")
    d = _stage(tmp, "events", _typed_events_table(rows))
    got = {
        r.user_id: (r.seq_len, r.has_funnel, r.vc_adjacent)
        for r in QUERIES["user_sequence_pattern"].fn(spark, d).collect()
    }
    by_user: dict[int, list] = {}
    for eid, (u, m, t) in enumerate(rows):
        by_user.setdefault(u, []).append((m, eid, t[0]))
    expect = {}
    for u, evs in by_user.items():
        seq = "".join(letter for _, _, letter in sorted(evs))
        expect[u] = (
            len(seq),
            1 if re.search("v.*c.*p", seq) else 0,
            seq.count("vc"),
        )
    assert got == expect


# ---------------------------------------------------------------------
# CUSUM == python argmax of |days*cum - k*total| per type
# ---------------------------------------------------------------------

day_events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["view", "click"]),
        st.integers(0, 6),  # day offset
    ),
    min_size=1,
    max_size=40,
)


def _day_events_table(rows):
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [BASE_US + d * 86_400_000_000 for _, d in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array([t for t, _ in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=day_events_strategy)
def test_cusum_matches_model(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("cusum")
    d = _stage(tmp, "events", _day_events_table(rows))
    got = {
        r.event_type: (r.change_day, r.cusum_scaled, r.direction)
        for r in QUERIES["cusum_changepoint"].fn(spark, d).collect()
    }
    from collections import Counter

    per_type: dict[str, Counter] = {}
    for t, day in rows:
        per_type.setdefault(t, Counter())[day] += 1
    expect = {}
    for t, counts in per_type.items():
        days = sorted(counts)
        n_days, total = len(days), sum(counts.values())
        cum, best = 0, None
        for k, day in enumerate(days, start=1):
            cum += counts[day]
            scaled = n_days * cum - k * total
            # tie-break: larger |scaled| wins, earliest day on ties
            if best is None or abs(scaled) > abs(best[1]):
                best = (day, scaled)
        direction = 1 if best[1] > 0 else (-1 if best[1] < 0 else 0)
        expect[t] = (f"2024-01-{best[0] + 1:02d}", best[1], direction)
    assert got == expect


# ---------------------------------------------------------------------
# Multi-touch attribution conserves purchase value (up to rounding)
# ---------------------------------------------------------------------

mta_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 40),
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(100, 5000),  # cents, positive so credit sums are meaningful
    ),
    min_size=2,
    max_size=30,
)


def _mta_events_table(rows):
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [BASE_US + m * 60_000_000 for _, m, _, _ in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([u for u, _, _, _ in rows], pa.int64()),
            "event_type": pa.array([t for _, _, t, _ in rows]),
            "value": pa.array([c / 100.0 for _, _, _, c in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=mta_strategy)
def test_mta_conserves_value(spark, tmp_path_factory, rows):
    """Both schemes must distribute exactly the total value of
    purchases that HAVE at least one touch in window — nothing
    created, nothing lost beyond 1e-4 rounding per credit."""
    tmp = tmp_path_factory.mktemp("mta")
    d = _stage(tmp, "events", _mta_events_table(rows))
    out = QUERIES["multi_touch_attribution"].fn(spark, d).collect()
    # python model: purchases with >= 1 strictly-earlier touch within 24h
    touches = [
        (u, m) for u, m, t, _ in rows if t in ("view", "click")
    ]
    attributed = 0.0
    n_credits = 0
    for u, m, t, c in rows:
        if t != "purchase":
            continue
        n_t = sum(
            1 for tu, tm in touches if tu == u and tm < m and tm >= m - 24 * 60
        )
        if n_t:
            attributed += c / 100.0
            n_credits += n_t
    got_linear = sum(r.linear_value for r in out)
    got_decay = sum(r.decay_value for r in out)
    got_credits = sum(r.n_credits for r in out)
    assert got_credits == n_credits
    tol = max(n_credits, 1) * 1e-4 + 1e-6
    assert abs(got_linear - attributed) <= tol
    assert abs(got_decay - attributed) <= tol


# ---------------------------------------------------------------------
# Blocked exact Jaccard == python over the same blocking rule
# ---------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=3, max_size=12),
    min_size=2,
    max_size=12,
)


def _docs_table(token_lists):
    return pa.table(
        {
            "doc_id": pa.array(range(len(token_lists)), pa.int64()),
            "text": pa.array([" ".join(t) for t in token_lists]),
            "lang": pa.array(["en"] * len(token_lists)),
            "source": pa.array(["src0"] * len(token_lists)),
            "n_chars": pa.array(
                [len(" ".join(t)) for t in token_lists], pa.int64()
            ),
        }
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(token_lists=docs_strategy)
def test_rareterm_jaccard_matches_model(spark, tmp_path_factory, token_lists):
    tmp = tmp_path_factory.mktemp("setsim")
    d = _stage(tmp, "documents", _docs_table(token_lists))
    got = {
        (r.doc_a, r.doc_b): (r.inter_sz, r.union_sz)
        for r in QUERIES["rareterm_jaccard_join"].fn(spark, d).collect()
    }
    shingle_sets = []
    for toks in token_lists:
        s = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        shingle_sets.append(s)
    from collections import Counter

    df = Counter()
    for s in shingle_sets:
        for sh in s:
            df[sh] += 1
    expect = {}
    for a in range(len(shingle_sets)):
        for b in range(a + 1, len(shingle_sets)):
            shared_rare = any(
                2 <= df[sh] <= 8
                for sh in shingle_sets[a] & shingle_sets[b]
            )
            if not shared_rare:
                continue
            inter = len(shingle_sets[a] & shingle_sets[b])
            union = len(shingle_sets[a] | shingle_sets[b])
            if inter / union >= 0.25:
                expect[(a, b)] = (inter, union)
    assert got == expect


# ---------------------------------------------------------------------
# Token bucket == python replay (dense timestamps force rejections)
# ---------------------------------------------------------------------

dense_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 1),        # user
        st.integers(0, 200),      # SECOND offset — dense, bucket will empty
    ),
    min_size=1,
    max_size=25,
)


def _dense_events_table(rows):
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [BASE_US + s * 1_000_000 for _, s in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=dense_events_strategy)
def test_token_bucket_matches_model(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("bucket")
    d = _stage(tmp, "events", _dense_events_table(rows))
    got = {
        r.user_id: (r.n_events, r.admitted, r.rejected, r.tokens_left)
        for r in QUERIES["token_bucket_admission"].fn(spark, d).collect()
    }
    CAP, REFILL = 5, 600
    by_user: dict[int, list] = {}
    for eid, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((s, eid))
    expect = {}
    for u, evs in by_user.items():
        tokens, admitted, last = CAP, 0, None
        for s, _eid in sorted(evs):
            if last is not None:
                tokens = min(CAP, tokens + (s - last) // REFILL)
            last = s
            if tokens >= 1:
                tokens -= 1
                admitted += 1
        expect[u] = (len(evs), admitted, len(evs) - admitted, tokens)
    assert got == expect
