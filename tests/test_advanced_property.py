"""Property-based checks for the advanced-analytics batches.

Each test regenerates one input table with randomized (but seeded)
data, runs the registered Spark plan against it, and compares with an
independent pure-Python model — the window-sweep/rewrite plans
(Pareto skyline, EWMA, MAD fences, 2-core peeling, harmonic
centrality) all have brute-force definitions that the randomized
data stresses far harder than the fixed testdata (deliberate ties,
degenerate groups, disconnected ids).
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.plans.registry import QUERIES
from memories_spark.sources.tables import TABLE_NAMES

SF = "/root/testdata/sf0.001"


def _stage(tmp_path, name: str, table: pa.Table) -> str:
    """Directory with all sf0.001 tables symlinked, one replaced."""
    d = tmp_path / "sf"
    if not d.exists():
        d.mkdir()
        for t in TABLE_NAMES:
            os.symlink(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    tgt = d / f"{name}.parquet"
    if tgt.is_symlink() or tgt.exists():
        tgt.unlink()
    pq.write_table(table, tgt)
    return str(d)


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------
# Pareto frontier: window sweep == brute-force dominance
# ---------------------------------------------------------------------

pairs_strategy = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6)),  # tiny domain → many ties
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(pairs=pairs_strategy)
def test_pareto_sweep_equals_bruteforce(spark, tmp_path_factory, pairs):
    tmp = tmp_path_factory.mktemp("pareto")
    part = pa.table(
        {
            "p_partkey": pa.array(range(len(pairs)), pa.int64()),
            "p_name": pa.array([f"part{i}" for i in range(len(pairs))]),
            "p_brand": pa.array(["B"] * len(pairs)),
            "p_type": pa.array(["T"] * len(pairs)),
            "p_size": pa.array([s for _, s in pairs], pa.int32()),
            "p_retailprice": pa.array([float(p) for p, _ in pairs], pa.float64()),
        }
    )
    d = _stage(tmp, "part", part)
    got = {
        (r.retail_price, r.p_size, r.n_parts)
        for r in QUERIES["pareto_frontier_parts"].fn(spark, d).collect()
    }
    # brute force over distinct (price_cents, size) pairs
    from collections import Counter

    dist = Counter((p * 100, s) for p, s in pairs)
    frontier = set()
    for (pc, s), n in dist.items():
        dominated = any(
            (pc2 <= pc and s2 >= s and (pc2 < pc or s2 > s)) for (pc2, s2) in dist
        )
        if not dominated:
            frontier.add((round(pc / 100.0, 2), s, n))
    assert got == frontier


# ---------------------------------------------------------------------
# EWMA: dyadic-weight window == direct model
# ---------------------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                       # user
        st.integers(0, 40),                      # minute offset (dups allowed)
        st.integers(-500, 500),                  # value in cents*...
    ),
    min_size=1,
    max_size=30,
)


def _events_table(rows):
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [base_us + m * 60_000_000 for _, m, _ in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([v / 100.0 for _, _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=events_strategy)
def test_ewma_matches_model(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("ewma")
    d = _stage(tmp, "events", _events_table(rows))
    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in QUERIES["ewma_user_value"].fn(spark, d).collect()
    }
    by_user: dict[int, list] = {}
    for eid, (u, m, v) in enumerate(rows):
        by_user.setdefault(u, []).append((m, eid, v / 100.0))
    expect = {}
    for u, evs in by_user.items():
        recent = sorted(evs, key=lambda t: (-t[0], -t[1]))[:20]
        s = sum(
            _round_half_up(v * 1e6) * 2 ** (21 - (rn + 1))
            for rn, (_, _, v) in enumerate(recent)
        )
        denom = 2.0**21 - 2.0 ** (21 - len(recent))
        expect[u] = (len(recent), round(s / denom / 1e6, 6))
    assert got == expect


# ---------------------------------------------------------------------
# MAD outliers: distinct-cumulative fences == direct model
# ---------------------------------------------------------------------


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=events_strategy)
def test_mad_outliers_match_model(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("mad")
    d = _stage(tmp, "events", _events_table(rows))
    out = QUERIES["value_mad_outliers"].fn(spark, d).collect()
    vals = sorted(v / 100.0 for _, _, v in rows)  # single event_type 'click'
    n = len(vals)
    med = vals[math.ceil(0.5 * n) - 1]
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[math.ceil(0.5 * n) - 1]
    n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.median, r.mad, r.n_outliers) == (n, med, mad, n_out)
    assert r.outlier_share == round(n_out / n, 6)


# ---------------------------------------------------------------------
# 2-core peeling and harmonic centrality on randomized id subsets
# ---------------------------------------------------------------------

ids_strategy = st.sets(st.integers(0, 120), min_size=2, max_size=60)


def _docs_table(ids):
    ids = sorted(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["w"] * len(ids)),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array([f"src{i % 20}/f" for i in ids]),
            "n_chars": pa.array([1] * len(ids), pa.int64()),
        }
    )


def _chain_edges(ids):
    s = set(ids)
    return [(i, i + k) for i in s for k in (20, 40) if i + k in s]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(ids=ids_strategy)
def test_2core_peeling_matches_model(spark, tmp_path_factory, ids):
    tmp = tmp_path_factory.mktemp("core")
    d = _stage(tmp, "documents", _docs_table(ids))
    got = [
        (r.round, r.n_nodes, r.n_edges)
        for r in QUERIES["graph_2core_rounds"].fn(spark, d).collect()
    ]
    edges = _chain_edges(ids)
    expect = []
    for rnd in range(1, 4):
        deg: dict[int, int] = {}
        for s, t in edges:
            deg[s] = deg.get(s, 0) + 1
            deg[t] = deg.get(t, 0) + 1
        nodes = {v for v, dg in deg.items() if dg >= 2}
        edges = [(s, t) for s, t in edges if s in nodes and t in nodes]
        expect.append((rnd, len(nodes), len(edges)))
    assert got == expect


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(ids=ids_strategy)
def test_harmonic_centrality_matches_model(spark, tmp_path_factory, ids):
    tmp = tmp_path_factory.mktemp("harm")
    d = _stage(tmp, "documents", _docs_table(ids))
    got = [
        (r.doc_id, r.n_reachable, r.harmonic)
        for r in QUERIES["harmonic_centrality"].fn(spark, d).collect()
    ]
    edges = _chain_edges(ids)
    adj: dict[int, set] = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    scores = []
    for src in adj:
        dist = {src: 0}
        frontier = [src]
        for hop in range(1, 5):
            nxt = []
            for v in frontier:
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = hop
                        nxt.append(w)
            frontier = nxt
        h_fp = sum(_round_half_up(1e12 / dd) for dd in dist.values() if dd > 0)
        scores.append((src, len(dist) - 1, round(h_fp / 1e12, 6)))
    scores.sort(key=lambda x: (-x[2], x[0]))
    assert got == scores[:20]
