"""Property-based connected-components parity vs pure-Python
union-find on random graphs.

The log-round operator must produce component = min node id of each
component for ANY graph shape — chains (worst case for propagation),
stars, cliques, isolated nodes — which the closed-form oracle query
only checks on the testdata chain graph.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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


def model_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(N_NODES))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(N_NODES)}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy)
def test_components_match_union_find(spark, edges):
    edges_df = spark.createDataFrame(
        edges or [(98, 99)], "from_id long, to_id long"
    )
    if not edges:
        edges_df = edges_df.filter("from_id < 0")
    nodes_df = spark.createDataFrame([(i,) for i in range(N_NODES)], "id long")
    got = {
        int(r.id): int(r.component)
        for r in graph_op.connected_components(edges_df, nodes_df).collect()
    }
    assert got == model_components(edges)
