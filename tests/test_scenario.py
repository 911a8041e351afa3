"""End-to-end lifecycle scenario: one narrative exercising the whole
serving + maintenance loop across feature boundaries.

Individual behaviors all have unit tests; this test pins the
interactions — search results feed the retrieval log, the log feeds
reinforcement, extraction mutates what search then sees, snapshots
capture and restore the accumulated state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import MockProvider, mock_embed, run_extraction
from memories_spark.search import hybrid_search

NOW = "2024-06-01 12:00:00"
T2 = "2024-06-02 12:00:00"
T3 = "2024-06-03 12:00:00"

FACTS = [
    ("the api gateway listens on port 7443", "net/gateway"),
    ("deploys run every friday afternoon", "ops/deploys"),
    ("the retry budget is three attempts", "net/retries"),
    ("postgres is the system of record", "data/stores"),
    ("grafana dashboards live in the ops folder", "ops/dashboards"),
]


@pytest.fixture()
def engine(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [
            {"text": t, "source": s, "embedding": mock_embed(t)}
            for t, s in FACTS
        ],
        NOW,
    )
    return eng


def test_full_lifecycle(engine, tmp_path):
    # 1. search finds the right memory for a paraphrase of it
    hits = hybrid_search(engine, "which port does the api gateway use", k=3).collect()
    assert hits and "7443" in hits[0].text
    top_id = hits[0].id

    # 2. hits feed the retrieval log; the batch apply reinforces them
    engine.log_retrieval([(r.id, i + 1) for i, r in enumerate(hits)], T2)
    applied = engine.apply_reinforcement()
    assert applied >= 1
    reinforced = (
        engine.table("memories").filter(F.col("id") == top_id).first().last_reinforced_at
    )
    assert reinforced is not None

    # 3. feedback accumulates per memory
    engine.log_feedback(top_id, "useful", T2)
    engine.log_feedback(top_id, "useful", T2)
    engine.log_feedback(top_id, "not_useful", T2)
    net = {r.memory_id: r.net for r in engine.feedback_net().collect()}
    assert net[top_id] == 1

    # 4. extraction updates an existing fact and adds a new one
    provider = MockProvider()
    transcript = (
        "FACT: the api gateway listens on port 7443 now behind the lb | detail\n"
        "FACT: the cache layer is redis with a 15 minute ttl | learning\n"
    )
    summary = run_extraction(engine, transcript, provider, "extract/session1", T3)
    assert summary["updated"] == 1 and summary["added"] == 1
    # supersede chain: old row archived, not latest, link recorded
    old = engine.table("memories").filter(F.col("id") == top_id).first()
    assert old.archived and not old.is_latest
    new_row = (
        engine.table("memories")
        .filter(F.col("supersedes") == top_id)
        .first()
    )
    assert new_row is not None and "lb" in new_row.text
    links = engine.get_links(new_row.id)
    assert any(r.type == "supersedes" for r in links.collect())

    # 5. search now surfaces the successor, never the archived original
    hits2 = hybrid_search(engine, "which port does the api gateway use", k=3).collect()
    ids2 = [r.id for r in hits2]
    assert new_row.id in ids2 and top_id not in ids2

    # 6. snapshot, destroy, restore — state comes back whole
    tag = engine.snapshot(T3)
    n_before = engine.count(include_archived=True)
    engine.delete_by_prefix("net")
    assert engine.count(include_archived=True) < n_before
    engine.restore_snapshot(tag)
    assert engine.count(include_archived=True) == n_before

    # 7. export/import round trip into a fresh engine preserves texts
    out = str(tmp_path / "export")
    n_exported = engine.export_ndjson(out)
    other = MemoriesEngine(engine.spark, str(tmp_path / "store2"))
    n_imported = other.import_ndjson(out, T3)["imported"]
    assert n_imported == n_exported
    # export carries every row (archived included, flags flattened out)
    texts_a = {r.text for r in engine.table("memories").select("text").collect()}
    texts_b = {r.text for r in other.table("memories").select("text").collect()}
    assert texts_b == texts_a
