"""MuSiQue-style multi-hop graph eval: support CHAINS of 2-3 linked
paragraphs, exercised through the full ``hybrid_search`` stack with
and without graph expansion.

Twin of the reference's second published graph-quality number
(/root/reference/eval/run_musique_graph_eval.py: per question, 20
paragraphs are seeded — the supporting chain plus distractors —
``related_to`` links wire consecutive supporting paragraphs, and the
metric compares answer hits in the top-5 with graph_weight 0 vs >0),
rebuilt with original corpora that keep the adversarial construction
of tests/test_graph_scenarios.py and EXTEND it to multi-hop:

- the intermediate (hop1) AND the answer paragraph (hop2) share ZERO
  tokens with the question (stopwords included), so the BM25 branch
  cannot see them;
- each corpus carries 30 distractors BUILT FROM the question's own
  tokens (MuSiQue's distractors are same-topic paragraphs), so the
  ``oversample = 3k`` vector window fills with genuinely-similar
  noise and the chain members' hash-noise similarity ranks outside
  it (the without-graph assertions below prove it on every run);
- each chain hop shares exactly one bridging term with its
  predecessor, so the chain is connected only through links + text
  bridges, like MuSiQue's decomposition chains.

With 3 PPR iterations, seed mass reaches 2 link-hops, and the 2
reserved graph slots admit (hop1, hop2) — so a 3-hop question's
answer is reachable; without graph expansion it cannot enter the
candidate set at all. The aggregate answer-hit uplift is pinned at
the reference's headline shape (graph ON finds every chained answer,
graph OFF none).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.search import hybrid_search

NOW = "2024-06-01 12:00:00"

_FILLER = [
    "notes from the review thread", "draft entry pending triage",
    "summary of the standup discussion", "ticket follow up item",
    "comment left during the audit", "observation from the postmortem",
    "checklist row for onboarding", "agenda point carried over",
    "remark captured in the minutes", "action item for next sprint",
]


def _query_noise(question: str, n: int = 30) -> list[str]:
    """MuSiQue-style same-topic distractors, generated from the
    question's own tokens: each shares 2 content tokens with the
    query, so it outranks hash-noise in BOTH the BM25 and vector
    branches — the candidate windows fill with these, never with the
    off-vocabulary chain members."""
    toks = question.split()
    out = []
    for j in range(n):
        a, b = toks[j % len(toks)], toks[(j * 3 + 1) % len(toks)]
        out.append(f"{a} {b} {_FILLER[j % len(_FILLER)]} variant {j}")
    return out

# (question, chain texts hop0..hopN, answer token living in the LAST hop)
CHAINS = {
    # --- 3-hop questions (2 links): answer is 2 link-hops away -------
    "mh1": (
        "which storage engine backs the metrics warehouse",
        [
            "the metrics warehouse backs onto storage engine icebox",
            "icebox clusters replicate via raft consensus, leader per shard",
            "raft snapshots compact each sunday, retained ninemonths",
        ],
        "ninemonths",
    ),
    "mh2": (
        "how are invoices charged for late payment",
        [
            "late payment invoices charged through the penalty module",
            "penalty module delegates to ratecalc library, version six",
            "ratecalc rounds half to even, capped at twelvepercent",
        ],
        "twelvepercent",
    ),
    "mh3": (
        "where do mobile crash reports get uploaded",
        [
            "mobile crash reports get uploaded to the triage bucket",
            "triage bucket drains into grouping pipelines each evening",
            "grouping pipelines dedupe stacks by frame hash, keeping fortynine days",
        ],
        "fortynine",
    ),
    "mh4": (
        "what powers the recommendation feed ranking",
        [
            "recommendation feed ranking powered by gradient boosted scorer",
            "scorer features come from clickhouse mart refreshed hourly",
            "clickhouse mart spans twelve shards, codename glacier",
        ],
        "glacier",
    ),
    # --- 2-hop questions (1 link): the reference's base case ---------
    "mh5": (
        "who approves production database schema changes",
        [
            "production database schema changes approved by storage guild",
            "storage guild rotates reviewers monthly, roster codename copperplate",
        ],
        "copperplate",
    ),
    "mh6": (
        "when does the weekly cost report go out",
        [
            "weekly cost report goes out monday after finance sync",
            "finance sync minutes archive under ledger codename brasslantern",
        ],
        "brasslantern",
    ),
}


def _rec(text, source):
    return {"text": text, "source": source, "embedding": mock_embed(text)}


@pytest.fixture(scope="module")
def mhstore(spark, tmp_path_factory):
    """One store, each question's ~23-row corpus under eval/mh{n}/
    (searched with that source_prefix — the prefix-pruned scan keeps
    every question isolated, like the reference's per-question
    delete-by-prefix cycle)."""
    eng = MemoriesEngine(spark, str(tmp_path_factory.mktemp("musique") / "store"))
    recs, pos = [], {}
    for scen, (question, chain, _) in CHAINS.items():
        for h, text in enumerate(chain):
            pos[(scen, h)] = len(recs)
            recs.append(_rec(text, f"eval/{scen}/p{h}"))
        for t in _query_noise(question):
            recs.append(_rec(t, f"eval/{scen}/noise"))
    ids = eng.add(recs, NOW)
    key = {sk: ids[i] for sk, i in pos.items()}
    # wire consecutive supporting paragraphs, exactly like the
    # reference's link step (run_musique_graph_eval.py step 3)
    edges = []
    for scen, (_, chain, _) in CHAINS.items():
        for h in range(len(chain) - 1):
            edges.append((key[(scen, h)], key[(scen, h + 1)], "related_to"))
    assert eng.add_links(edges, NOW) == len(edges)
    return eng, key


_BUILD_LOCK = threading.Lock()


def _run_all(eng, graph_weight):
    def run(item):
        scen, (q, _, _) = item
        # plan construction is py4j-heavy; serialize it (the lock the
        # oracle-parity harness also uses) and collect concurrently
        with _BUILD_LOCK:
            df = hybrid_search(
                eng, q, k=5, graph_weight=graph_weight, auto_intent=False,
                now=NOW, source_prefix=f"eval/{scen}/",
            )
        return scen, df.collect()

    with ThreadPoolExecutor(6) as ex:
        return dict(ex.map(run, CHAINS.items()))


@pytest.fixture(scope="module")
def results(mhstore):
    eng, _ = mhstore
    return _run_all(eng, 0.3), _run_all(eng, 0.0)


def _has_answer(rows, token):
    return any(token in r.text for r in rows)


def test_answer_hit_uplift_pinned(results):
    """The reference's headline metric: answer present in the top-5
    texts, graph ON vs OFF. Every chained answer is reachable only
    through links, so the uplift is total: 6/6 on, 0/6 off."""
    on, off = results
    hits_on = sum(_has_answer(on[s], CHAINS[s][2]) for s in CHAINS)
    hits_off = sum(_has_answer(off[s], CHAINS[s][2]) for s in CHAINS)
    assert hits_on == len(CHAINS), {
        s: [r.text for r in on[s]] for s in CHAINS if not _has_answer(on[s], CHAINS[s][2])
    }
    assert hits_off == 0, {
        s: [r.text for r in off[s]] for s in CHAINS if _has_answer(off[s], CHAINS[s][2])
    }


def test_full_support_chain_recall_with_graph(results, mhstore):
    """With graph expansion, the ENTIRE support chain is in the top-5
    (hop0 direct, hop1/hop2 through PPR mass + the reserved slots) —
    the reference's support_on count at its maximum."""
    on, _ = results
    _, key = mhstore
    for scen, (_, chain, _) in CHAINS.items():
        got = {r.id for r in on[scen]}
        want = {key[(scen, h)] for h in range(len(chain))}
        assert want <= got, (scen, want, got)


def test_intermediate_hops_unreachable_without_graph(results, mhstore):
    """Without links, no non-seed chain member can enter the top-5:
    they share zero tokens with the question and rank outside the
    vector oversample window."""
    _, off = results
    _, key = mhstore
    for scen, (_, chain, _) in CHAINS.items():
        got = {r.id for r in off[scen]}
        for h in range(1, len(chain)):
            assert key[(scen, h)] not in got, (scen, h)


def test_multihop_answers_arrive_via_graph_slots(results, mhstore):
    """The 2-link answers surface with a graph match_type — injected
    by the reserved slots or lifted by graph support, never as plain
    direct hits."""
    on, _ = results
    _, key = mhstore
    for scen in ("mh1", "mh2", "mh3", "mh4"):
        n_hops = len(CHAINS[scen][1])
        answer_id = key[(scen, n_hops - 1)]
        row = next(r for r in on[scen] if r.id == answer_id)
        assert "graph" in row.match_type, (scen, row)
