"""Temporal-reasoning eval twin (reference CHANGELOG.md:41: the
LongMemEval temporal-reasoning category moved 42.2% -> 85.5% once
``document_at`` anchoring + temporal intent landed).

Construction mirrors that eval deterministically: each entity has
THREE versions of the same fact whose texts differ only in a value
token the question never mentions, all written at the SAME
``created_at`` — lexical and vector signals cannot separate the
versions, and only the ``document_at`` anchor can. Questions carry
natural temporal expressions the REAL intent classifier parses
("in april", "last month"); accuracy@1 is the share of questions
whose top hit is the version inside the asked window.

Pinned uplift: near-chance without auto-intent (the three versions
tie), ~perfect with it — the same shape as the reference's +43pp."""

from __future__ import annotations

import pytest

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.search import hybrid_search

NOW = "2024-06-15 10:00:00"  # mid-June: "last month" = May
CREATED = "2024-06-01 00:00:00"  # identical for every version

ENTITIES = ["gateway", "billing", "search", "storage", "ingest"]
#: (month name, document_at, value) — value tokens never appear in
#: questions, so they carry no lexical signal
VERSIONS = [
    ("march", "2024-03-10 00:00:00", "forty"),
    ("april", "2024-04-12 00:00:00", "seventy"),
    ("may", "2024-05-09 00:00:00", "ninety"),
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    eng = MemoriesEngine(spark, str(tmp_path_factory.mktemp("temporal") / "store"))
    rows = []
    for e in ENTITIES:
        for _, doc_at, val in VERSIONS:
            text = f"the {e} service request limit was set to {val}"
            rows.append({
                "text": text, "source": f"ops/{e}", "document_at": doc_at,
                "embedding": mock_embed(text),
            })
    eng.add(rows, CREATED)
    return eng


def _gold_ids(store):
    """entity -> {month: id} from the stored rows."""
    out: dict[str, dict[str, int]] = {}
    by_val = {val: mon for mon, _, val in VERSIONS}
    for r in store.table("memories").collect():
        entity = r.text.split()[1]
        val = r.text.split()[-1]
        out.setdefault(entity, {})[by_val[val]] = r.id
    return out


def _questions():
    """(query, gold month) — forms the reference grammar parses."""
    qs = []
    for e in ENTITIES:
        qs.append((f"what was the {e} service request limit in april", "april"))
        qs.append((f"the {e} service request limit last month", "may"))
    return qs


def _accuracy(store, auto_intent: bool, report: list | None = None) -> float:
    """Version-selection accuracy: for each question, the FIRST
    returned hit belonging to the asked entity must be the version
    inside the asked window. Judging the entity's first hit (not the
    absolute top) isolates the temporal signal from the toy
    embedder's cross-entity hash-collision noise — the thing under
    eval is WHICH VERSION of the fact surfaces, the reference's
    temporal-reasoning category exactly. k=5 like the reference eval:
    candidates oversample 3k BEFORE the temporal filter
    (memory_engine.py:1752), so a k=1 call can filter away its whole
    3-row candidate list."""
    gold = _gold_ids(store)
    hits = 0
    qs = _questions()
    for q, month in qs:
        out = hybrid_search(store, q, k=5, auto_intent=auto_intent, now=NOW).collect()
        entity = q.split("the ")[1].split()[0]
        entity_ids = set(gold[entity].values())
        first = next((r.id for r in out if r.id in entity_ids), None)
        ok = first == gold[entity][month]
        if ok:
            hits += 1
        if report is not None:
            # full per-question payload so a failure NAMES the broken
            # question + what came back, instead of a bare ratio (the
            # round-5 verdict's diagnosability ask after one
            # unreproduced full-suite-only flake of the pinned test)
            report.append({
                "q": q, "month": month, "ok": ok, "first": first,
                "want": gold[entity][month],
                "returned": [(r.id, round(r.rrf_score, 6)) for r in out],
            })
    return hits / len(qs)


def test_versions_are_lexically_indistinguishable(store):
    """The construction's premise: without a temporal window, the
    three versions of an entity tie on text — the top-3 for a
    windowless query are exactly the entity's versions in id order
    (pure tie-break), not a content-driven pick."""
    gold = _gold_ids(store)
    top3 = hybrid_search(store, "the gateway service request limit",
                         k=3, auto_intent=False, now=NOW).collect()
    assert {r.id for r in top3} == set(gold["gateway"].values())
    ids = [r.id for r in top3]
    assert ids == sorted(ids)  # id tie-break, no lexical signal


def test_temporal_intent_uplift_pinned(store):
    """The headline: document_at + temporal intent takes accuracy@1
    from near-chance to perfect — the reference's 42.2 -> 85.5
    movement in deterministic form."""
    rep_with: list = []
    rep_without: list = []
    with_intent = _accuracy(store, auto_intent=True, report=rep_with)
    without = _accuracy(store, auto_intent=False, report=rep_without)
    misses = [r for r in rep_with if not r["ok"]]
    assert with_intent == 1.0, f"{with_intent}: {misses}"
    assert without <= 0.5, [r for r in rep_without if r["ok"]]
    assert with_intent - without >= 0.5


def test_document_at_beats_created_at_as_anchor(store):
    """All versions share created_at; the window filter must anchor
    on document_at (reference read priority memory_engine.py:1472,
    1824) — an explicit April window returns ONLY the April rows."""
    out = hybrid_search(
        store, "service request limit", k=15, auto_intent=False, now=NOW,
        since="2024-04-01 00:00:00", until="2024-04-30 23:59:59",
    ).collect()
    gold = _gold_ids(store)
    assert {r.id for r in out} == {g["april"] for g in gold.values()}


def test_month_window_comes_from_the_real_classifier(store):
    """End to end through classify_intent: 'in april' resolves to the
    April window at NOW (year back-off not triggered) and the top hit
    is the April version — no caller-provided dates anywhere."""
    gold = _gold_ids(store)
    top = hybrid_search(store, "what was the billing service request limit in april",
                        k=5, auto_intent=True, now=NOW).collect()
    ids = [r.id for r in top]
    # the window really filtered: billing's April version is served,
    # its March/May versions are not
    assert gold["billing"]["april"] in ids
    assert gold["billing"]["march"] not in ids
    assert gold["billing"]["may"] not in ids
