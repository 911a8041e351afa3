"""Graph-retrieval eval scenarios: corpora engineered so the answer
is reachable ONLY via a ``related_to`` link, exercised through the
full ``hybrid_search(graph_weight>0)`` path.

Twin of the reference's 10 graph eval scenarios
(/root/reference/eval/scenarios/graph/graph-001..010*.yaml), rebuilt
with original corpora that preserve the adversarial construction:

- the answer memory shares ZERO tokens with the query (so the BM25
  branch cannot see it — including stopwords, which still produce
  BM25 candidacy), and
- its hashed-bag-of-words mock embedding ranks OUTSIDE the
  ``oversample = 3k`` vector candidate window for the 22-25 row
  corpus (ranks were measured; they are deterministic).

So without graph expansion the answer cannot enter the candidate
set at all, and with ``graph_weight > 0`` it must surface through
PPR + the reserved-slot merge. The control (009) and scope (010)
cases pin the inverse properties: graph support never displaces a
direct answer and never leaks across a source-prefix boundary.

Scenarios 1-9 share ONE module-scoped store, each namespaced under
``eval/g{n}/`` and searched with that ``source_prefix`` — the
prefix-pruned scan makes every scenario see exactly its own 22-25
row corpus (the same isolation a multi-tenant store relies on), and
building the store once keeps the suite CI-runnable. Scenario 10
needs cross-prefix link isolation, so it builds its own store.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.search import hybrid_search

NOW = "2024-06-01 12:00:00"

# Shared 20-row noise pool: plausible engineering notes. Several share
# high-df tokens with the queries (the/at/with/...) so the BM25
# candidate window fills with noise, exactly like the reference's
# distractor construction.
NOISE = [
    "http router lives under app/routes with folder conventions",
    "login tokens verified by middleware, sessions idle out nightly",
    "pipeline builds typescript then ships artifacts to the edge",
    "client state kept in a small store module with immutable updates",
    "outbound mail rendered from component templates in app/mail",
    "uploads land in object storage behind short-lived signed urls",
    "full-text index rebuilt every night from the primary tables",
    "metrics scraped into dashboards tracking latency and errors",
    "feature flags toggled through a yaml manifest per environment",
    "background jobs drain a queue with exponential retry backoff",
    "payments webhooks verified by signature before processing",
    "image thumbnails generated on upload at three fixed widths",
    "rate limits enforced per api key at the gateway layer",
    "sprint planning doc updated every other monday morning",
    "the cdn purges cached assets when a release tag lands",
    "database migrations reviewed by two people before merge",
    "incident retrospectives filed within five working days",
    "localization strings sync from the translation vendor weekly",
    "accessibility audit runs quarterly with an external firm",
    "dependency updates batched by the bot into one weekly pr",
]

# (scenario, memories [(key, text, source-suffix)], links)
SCENARIOS = {
    "g1": (
        [
            ("m1", "data mapper library is quillsql for every database access path", ""),
            ("m2", "persistence layer configuration lives at conf/quill.toml with pool max twenty", ""),
        ],
        [("m1", "m2")],
    ),
    "g2": (
        [
            ("m1", "decision caching goes through memcache chosen for simplicity", ""),
            ("m2", "expiry window fifteen minutes set inside conf/expiry.toml", ""),
        ],
        [("m1", "m2")],
    ),
    "g3": (
        [
            ("m1", "signin handled with passkeys, the account session comes from the gateway", ""),
            ("m2", "rowstore table account-sessions keeps entries for one day", ""),
        ],
        [("m1", "m2")],
    ),
    "g4": (
        [
            ("m1", "billing service wraps outcomes in an either container never raising", "proj/billing"),
            ("m2", "lesson: typed outcome wrappers keep failure paths visible to compilers", "learning/patterns"),
        ],
        [("m1", "m2")],
    ),
    "g5": (
        [
            ("m1", "endpoint contract checks every request body shape strictly", ""),
            ("m3", "table blueprint checks every column shape strictly", ""),
            ("m2", "shapecheck module found inside lib/shapes, fourth major release", ""),
        ],
        [("m1", "m2"), ("m3", "m2")],  # both seeds link to the neighbor
    ),
    "g6": (
        [
            ("m1", "production workloads deploy onto the nomad fleet infrastructure", ""),
            ("m2", "credentials sealed by keywhiz, sidecar refreshes them every ninety days", ""),
        ],
        [("m1", "m2")],
    ),
    "g7": (
        [
            ("m1", "checks framework decision settled after the spike", ""),
            ("m2", "specrunner config at specrunner.conf.ts with dom helpers", ""),
            ("n1", "checks run nightly against the staging cluster", ""),
            ("n2", "checks coverage threshold gate set at eighty percent", ""),
            ("n3", "checks flake quarantine list reviewed each sprint", ""),
        ],
        [("m1", "m2")],
    ),
    "g8": (
        [
            ("m1", "logging bootstrap wires the emitter in app/boot", ""),
            ("m2", "emit records as structured objects carrying traceToken from header", ""),
        ],
        [("m2", "m1")],  # incoming link: the NEWER memory links TO the hit
    ),
    "g9": (
        [
            ("m1", "container base image is distroless java seventeen, final size ninety megabytes", ""),
            ("m2", "meeting notes from the platform sync last tuesday", ""),
            ("m3", "holiday calendar for the support rotation", ""),
        ],
        [("m2", "m3")],  # links exist but point at irrelevant rows
    ),
}


def _rec(text, source):
    return {"text": text, "source": source, "embedding": mock_embed(text)}


@pytest.fixture(scope="module")
def gstore(spark, tmp_path_factory):
    """One store for scenarios 1-9, each under eval/g{n}/ (searched
    with that source_prefix, so each sees only its own corpus)."""
    eng = MemoriesEngine(spark, str(tmp_path_factory.mktemp("gscen") / "store"))
    recs, keys, links = [], {}, []
    for scen, (mems, ls) in SCENARIOS.items():
        base = f"eval/{scen}"
        for k, text, suffix in mems:
            keys[(scen, k)] = len(recs)
            recs.append(_rec(text, f"{base}/{suffix}" if suffix else f"{base}/m"))
        for t in NOISE:
            recs.append(_rec(t, f"{base}/noise"))
        links += [(scen, a, b) for a, b in ls]
    ids = eng.add(recs, NOW)
    key = {sk: ids[i] for sk, i in keys.items()}
    for scen, a, b in links:
        eng.add_link(key[(scen, a)], key[(scen, b)], "related_to", NOW)
    return eng, key


def _ids(rows):
    return [r.id for r in rows]


def _search_pair(eng, query, prefix, k=2):
    """(with graph, without graph) — construction serialized (py4j),
    the two Spark jobs still execute concurrently."""
    import threading

    lock = threading.Lock()

    def run(gw):
        with lock:
            df = hybrid_search(
                eng, query, k=k, graph_weight=gw, auto_intent=False, now=NOW,
                source_prefix=prefix,
            )
        return df.collect()

    with ThreadPoolExecutor(2) as ex:
        return tuple(ex.map(run, (0.3, 0.0)))


def _assert_link_only(gstore, scen, query, k=2):
    """The scenario invariant: answer memory m2 surfaces with graph
    expansion on, and cannot surface at the same k without it."""
    eng, key = gstore
    with_graph, without = _search_pair(eng, query, f"eval/{scen}/", k=k)
    assert key[(scen, "m2")] in _ids(with_graph), with_graph
    assert key[(scen, "m2")] not in _ids(without)
    return with_graph


def test_graph_001_neighbor_recall_disjoint_vocabulary(gstore):
    rows = _assert_link_only(
        gstore, "g1",
        "which data mapper library does the project use for database access", k=5,
    )
    # surfaced BY the graph: either injected via a reserved slot
    # ("graph") or lifted into top-5 by graph support ("direct+graph")
    _, key = gstore
    assert "graph" in next(r for r in rows if r.id == key[("g1", "m2")]).match_type


def test_graph_002_cross_session_decision(gstore):
    _assert_link_only(gstore, "g2", "what did we decide about caching")


def test_graph_003_knowledge_chain_one_hop(gstore):
    _assert_link_only(gstore, "g3", "how is signin session handled at the gateway")


def test_graph_004_cross_source_connection(gstore):
    _assert_link_only(
        gstore, "g4", "why does the billing service use an either container"
    )


def test_graph_005_multi_seed_convergence(gstore):
    _assert_link_only(
        gstore, "g5", "what checks request body and column shape strictly"
    )


def test_graph_006_indirect_only(gstore):
    _assert_link_only(gstore, "g6", "production infrastructure deploy workloads")


def test_graph_007_noise_resistance(gstore):
    rows = _assert_link_only(
        gstore, "g7", "which checks framework decision did we settle on"
    )
    # k=2 with three same-term distractors competing: the linked
    # answer takes a slot the distractors wanted
    assert len(rows) == 2


def test_graph_008_bidirectional_incoming_link(gstore):
    _assert_link_only(gstore, "g8", "where is the logging bootstrap wired")


def test_graph_009_no_graph_baseline(gstore):
    eng, key = gstore
    query = "container base image size"
    with_graph, without = _search_pair(eng, query, "eval/g9/")
    # graph expansion must not displace the direct answer from #1
    assert with_graph[0].id == key[("g9", "m1")], with_graph
    assert without[0].id == key[("g9", "m1")], without


def test_graph_010_scope_boundary(spark, tmp_path):
    """Needs its own store: the link crosses a source-prefix boundary
    and the in-scope prefix must not leak the out-of-scope neighbor."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    recs = [
        _rec("throttling for the invoices endpoint uses leaky bucket at forty per second", "wip/invoices"),
        _rec("general lesson: leaky bucket smooths bursts better than fixed windows", "learning/general"),
    ] + [_rec(t, "wip/notes") for t in NOISE]
    ids = eng.add(recs, NOW)
    m1, m2 = ids[0], ids[1]
    eng.add_link(m1, m2, "related_to", NOW)
    query = "what throttling approach protects the invoices endpoint"
    in_scope = hybrid_search(
        eng, query, k=2, graph_weight=0.3, auto_intent=False, now=NOW,
        source_prefix="wip/",
    ).collect()
    assert m1 in _ids(in_scope)
    # the linked neighbor lives outside wip/ and must NOT leak in
    assert m2 not in _ids(in_scope), in_scope
    # sanity: without the prefix the link does surface it
    unscoped = hybrid_search(
        eng, query, k=2, graph_weight=0.3, auto_intent=False, now=NOW
    ).collect()
    assert m2 in _ids(unscoped)
