"""AUDN extraction-pipeline tests on the deterministic MockProvider
(the reference's own test strategy: mocked LLM, real action rules)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import (
    MockProvider,
    mock_embed,
    run_extraction,
)

NOW = "2024-06-01 12:00:00"
LATER = "2024-06-02 12:00:00"


@pytest.fixture()
def engine(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [
            {"text": "the api uses port 7443", "source": "proj/net",
             "embedding": mock_embed("the api uses port 7443")},
            {"text": "deploys run on fridays", "source": "proj/ops",
             "embedding": mock_embed("deploys run on fridays")},
            {"text": "pinned secret fact", "source": "proj/sec", "pinned": True,
             "embedding": mock_embed("pinned secret fact")},
        ],
        NOW,
    )
    return eng


def test_extract_facts_parsing_and_caps():
    p = MockProvider()
    facts = p.extract_facts(
        "noise line\nFACT: alpha | decision\nFACT: beta | bogus\nDELETE: gamma\n"
    )
    assert [f["text"] for f in facts] == ["alpha", "beta", "gamma"]
    assert facts[0]["category"] == "decision"
    assert facts[1]["category"] == "detail"  # unknown category normalized
    assert facts[2]["directive"] == "DELETE"


def test_add_novel_fact_with_autolink(engine):
    p = MockProvider()
    s = run_extraction(engine, "FACT: kubernetes cluster has three nodes", p, "proj/infra", LATER)
    assert s["added"] == 1 and s["noop"] == 0
    new_id = s["new_ids"][0]
    row = engine.get([new_id]).collect()[0]
    assert row.source == "proj/infra" and row.category == "detail"
    # auto-links to similar existing rows (sim >= 0.005, up to 3)
    assert engine.get_links(new_id, "out").count() <= 3


def test_noop_on_exact_duplicate(engine):
    p = MockProvider()
    s = run_extraction(engine, "FACT: the api uses port 7443", p, "proj/net", LATER)
    assert s["noop"] == 1 and s["added"] == 0
    assert engine.count() == 3


def test_update_supersedes_and_archives_old(engine):
    # same bag of words +1 token → sim in the UPDATE band
    p = MockProvider()
    s = run_extraction(
        engine, "FACT: the api uses port 7443 now", p, "proj/net", LATER
    )
    assert s["updated"] == 1
    new_id = s["new_ids"][0]
    new_row = engine.get([new_id]).collect()[0]
    assert new_row.supersedes == 0
    assert new_row.previous_text == "the api uses port 7443"
    old_row = engine.get([0]).collect()[0]
    assert old_row.archived is True and old_row.is_latest is False
    links = [(r.from_id, r.to_id, r.type) for r in engine.table("links").collect()]
    assert (new_id, 0, "supersedes") in links


def test_delete_guard_protects_pinned(engine):
    p = MockProvider()
    s = run_extraction(engine, "DELETE: pinned secret fact", p, "proj/sec", LATER)
    assert s["blocked"] == 1 and s["deleted"] == 0
    assert engine.get([2]).count() == 1


def test_delete_unprotected(engine):
    p = MockProvider()
    s = run_extraction(engine, "DELETE: deploys run on fridays", p, "proj/ops", LATER)
    assert s["deleted"] == 1
    assert engine.get([1]).count() == 0


def test_conflict_keeps_both(engine):
    p = MockProvider()
    s = run_extraction(engine, "CONFLICT: the api uses port 9000", p, "proj/net", LATER)
    assert s["conflict"] == 1
    new_id = s["new_ids"][0]
    row = engine.get([new_id]).collect()[0]
    assert row.conflicts_with is not None
    assert engine.get([int(row.conflicts_with)]).count() == 1  # both kept


def test_dry_run_mutates_nothing(engine):
    p = MockProvider()
    s = run_extraction(
        engine, "FACT: brand new fact\nDELETE: deploys run on fridays", p, "x", LATER,
        dry_run=True,
    )
    assert s["extracted"] == 2
    assert engine.count() == 3
    assert [d["action"] for d in s["decisions"]] == ["ADD", "DELETE"]


def test_batched_similarity_one_pass(engine):
    """All facts share one top-k join (provider sees k<=5 similar)."""
    p = MockProvider()
    run_extraction(
        engine,
        "FACT: one new thing\nFACT: another new thing\nFACT: third new thing",
        p,
        "x",
        LATER,
    )
    assert len(p.calls) == 3
    assert all(n <= 5 for _, n in p.calls)


def test_mock_embed_deterministic_and_normalized():
    a = mock_embed("hello world")
    assert a == mock_embed("hello world")
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9
    assert mock_embed("hello world") != mock_embed("different text")
