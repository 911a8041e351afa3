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
"""

from __future__ import annotations

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


def _rec(text, source):
    return {"text": text, "source": source, "embedding": mock_embed(text)}


def _build(spark, tmp_path, memories, links, noise_source="notes/pool"):
    """memories: list[(key, text, source)]; links: [(from_key, to_key)].
    The 20-row noise pool is appended after the scenario memories."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    recs = [_rec(t, s) for _, t, s in memories]
    recs += [_rec(t, noise_source) for t in NOISE]
    ids = eng.add(recs, NOW)
    by_key = {k: i for (k, _, _), i in zip(memories, ids)}
    for a, b in links:
        eng.add_link(by_key[a], by_key[b], "related_to", NOW)
    return eng, by_key


def _ids(rows):
    return [r.id for r in rows]


def _search(eng, query, with_graph, k=2, **kw):
    return hybrid_search(
        eng,
        query,
        k=k,
        graph_weight=0.3 if with_graph else 0.0,
        auto_intent=False,
        now=NOW,
        **kw,
    ).collect()


def _assert_link_only(eng, key, query, k=2):
    """The scenario invariant: answer memory m2 surfaces with graph
    expansion on, and cannot surface at the same k without it."""
    with_graph = _search(eng, query, True, k=k)
    assert key["m2"] in _ids(with_graph), with_graph
    assert key["m2"] not in _ids(_search(eng, query, False, k=k))
    return with_graph


# --- graph-001: neighbor recall, disjoint vocabulary ----------------


def test_graph_001_neighbor_recall_disjoint_vocabulary(spark, tmp_path):
    mems = [
        ("m1", "data mapper library is quillsql for every database access path", "eval/g1"),
        ("m2", "persistence layer configuration lives at conf/quill.toml with pool max twenty", "eval/g1"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2")])
    query = "which data mapper library does the project use for database access"
    with_graph = _assert_link_only(eng, key, query, k=5)
    # surfaced BY the graph: either injected via a reserved slot
    # ("graph") or lifted into top-5 by graph support ("direct+graph")
    assert "graph" in next(r for r in with_graph if r.id == key["m2"]).match_type


# --- graph-002: cross-session decision -> implementation ------------


def test_graph_002_cross_session_decision(spark, tmp_path):
    mems = [
        ("m1", "decision caching goes through memcache chosen for simplicity", "eval/g2"),
        ("m2", "expiry window fifteen minutes set inside conf/expiry.toml", "eval/g2"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2")])
    _assert_link_only(eng, key, "what did we decide about caching")


# --- graph-003: knowledge chain, shared word but 1-hop answer -------


def test_graph_003_knowledge_chain_one_hop(spark, tmp_path):
    mems = [
        ("m1", "signin handled with passkeys, the account session comes from the gateway", "eval/g3"),
        ("m2", "rowstore table account-sessions keeps entries for one day", "eval/g3"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2")])
    _assert_link_only(eng, key, "how is signin session handled at the gateway")


# --- graph-004: cross-source general pattern <- project detail ------


def test_graph_004_cross_source_connection(spark, tmp_path):
    mems = [
        ("m1", "billing service wraps outcomes in an either container never raising", "proj/billing"),
        ("m2", "lesson: typed outcome wrappers keep failure paths visible to compilers", "learning/patterns"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2")])
    _assert_link_only(eng, key, "why does the billing service use an either container")


# --- graph-005: multi-seed convergence on a shared neighbor ---------


def test_graph_005_multi_seed_convergence(spark, tmp_path):
    mems = [
        ("m1", "endpoint contract checks every request body shape strictly", "eval/g5"),
        ("m3", "table blueprint checks every column shape strictly", "eval/g5"),
        ("m2", "shapecheck module found inside lib/shapes, fourth major release", "eval/g5"),
    ]
    # BOTH searchable memories link to the shared neighbor
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2"), ("m3", "m2")])
    _assert_link_only(eng, key, "what checks request body and column shape strictly")


# --- graph-006: answer reachable only via the link ------------------


def test_graph_006_indirect_only(spark, tmp_path):
    mems = [
        ("m1", "production workloads deploy onto the nomad fleet infrastructure", "eval/g6"),
        ("m2", "credentials sealed by keywhiz, sidecar refreshes them every ninety days", "eval/g6"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2")])
    _assert_link_only(eng, key, "production infrastructure deploy workloads")


# --- graph-007: linked neighbor wins over same-term distractors -----


def test_graph_007_noise_resistance(spark, tmp_path):
    mems = [
        ("m1", "checks framework decision settled after the spike", "eval/g7"),
        ("m2", "specrunner config at specrunner.conf.ts with dom helpers", "eval/g7"),
        ("n1", "checks run nightly against the staging cluster", "eval/g7"),
        ("n2", "checks coverage threshold gate set at eighty percent", "eval/g7"),
        ("n3", "checks flake quarantine list reviewed each sprint", "eval/g7"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m1", "m2")])
    query = "which checks framework decision did we settle on"
    rows = _assert_link_only(eng, key, query)
    # k=2 with three same-term distractors competing: the linked
    # answer takes a slot the distractors wanted
    assert key["m2"] in _ids(rows) and len(rows) == 2


# --- graph-008: incoming link discovery (B -> A, search hits A) -----


def test_graph_008_bidirectional_incoming_link(spark, tmp_path):
    mems = [
        ("m1", "logging bootstrap wires the emitter in app/boot", "eval/g8"),
        ("m2", "emit records as structured objects carrying traceToken from header", "eval/g8"),
    ]
    # the NEWER memory links TO the old one; expansion must walk the
    # incoming edge (graph_op.bidirectional)
    eng, key = _build(spark, tmp_path, mems, [("m2", "m1")])
    _assert_link_only(eng, key, "where is the logging bootstrap wired")


# --- graph-009: control — direct match, irrelevant links ------------


def test_graph_009_no_graph_baseline(spark, tmp_path):
    mems = [
        ("m1", "container base image is distroless java seventeen, final size ninety megabytes", "eval/g9"),
        ("m2", "meeting notes from the platform sync last tuesday", "eval/g9"),
        ("m3", "holiday calendar for the support rotation", "eval/g9"),
    ]
    eng, key = _build(spark, tmp_path, mems, [("m2", "m3")])
    query = "container base image size"
    for with_graph in (True, False):
        rows = _search(eng, query, with_graph)
        # graph expansion must not displace the direct answer from #1
        assert rows[0].id == key["m1"], rows


# --- graph-010: scope boundary — link must not cross the prefix -----


def test_graph_010_scope_boundary(spark, tmp_path):
    mems = [
        ("m1", "throttling for the invoices endpoint uses leaky bucket at forty per second", "wip/invoices"),
        ("m2", "general lesson: leaky bucket smooths bursts better than fixed windows", "learning/general"),
    ]
    eng, key = _build(
        spark, tmp_path, mems, [("m1", "m2")], noise_source="wip/notes"
    )
    query = "what throttling approach protects the invoices endpoint"
    in_scope = _search(eng, query, True, source_prefix="wip/")
    assert key["m1"] in _ids(in_scope)
    # the linked neighbor lives outside wip/ and must NOT leak in
    assert key["m2"] not in _ids(in_scope), in_scope
    # sanity: without the prefix the link does surface it
    assert key["m2"] in _ids(_search(eng, query, True))
