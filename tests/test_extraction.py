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


def test_profiles_change_decisions_for_same_transcript(engine):
    """J10 wired into extraction (reference llm_extract.py:820-860 +
    extraction_profiles.py:68-113): two source prefixes with different
    AUDN bands produce different ADD/UPDATE/NOOP decisions for the
    SAME transcript. 'the api uses port 7443 now' scores in the
    default UPDATE band [0.80, 0.95) vs memory 0; a profile that
    raises sim_update above that similarity turns it into an ADD, and
    one that lowers sim_noop below it turns it into a NOOP."""
    transcript = "FACT: the api uses port 7443 now"
    profiles = [
        {"source_prefix": "strict/", "sim_update": 0.99},
        {"source_prefix": "lenient/", "sim_noop": 0.5},
    ]
    s_default = run_extraction(
        engine, transcript, MockProvider(), "proj/net", LATER,
        dry_run=True, profiles=profiles,
    )
    s_strict = run_extraction(
        engine, transcript, MockProvider(), "strict/net", LATER,
        dry_run=True, profiles=profiles,
    )
    s_lenient = run_extraction(
        engine, transcript, MockProvider(), "lenient/net", LATER,
        dry_run=True, profiles=profiles,
    )
    assert [d["action"] for d in s_default["decisions"]] == ["UPDATE"]
    assert [d["action"] for d in s_strict["decisions"]] == ["ADD"]
    assert [d["action"] for d in s_lenient["decisions"]] == ["NOOP"]


def test_profile_longest_prefix_and_caps(engine):
    """Most-specific prefix wins the cascade; max_facts/max_fact_chars
    caps come from the resolved profile."""
    from memories_spark.extraction import resolve_profile

    profiles = [
        {"source_prefix": "team/", "max_facts": 2, "sim_noop": 0.9},
        {"source_prefix": "team/proj/", "max_facts": 1},
    ]
    r = resolve_profile(profiles, "team/proj/x")
    assert r["max_facts"] == 1          # most-specific explicit knob
    assert r["sim_noop"] == 0.9         # inherited from parent prefix
    assert r["sim_update"] == 0.80      # default

    s = run_extraction(
        engine, "FACT: one\nFACT: two\nFACT: three", MockProvider(),
        "team/proj/x", LATER, dry_run=True, profiles=profiles,
    )
    assert s["extracted"] == 1

    s2 = run_extraction(
        engine, "FACT: one\nFACT: two\nFACT: three", MockProvider(),
        "team/other", LATER, dry_run=True, profiles=profiles,
    )
    assert s2["extracted"] == 2


def test_profile_disabled_prefix_noops(engine):
    s = run_extraction(
        engine, "FACT: something", MockProvider(), "quiet/src", LATER,
        profiles=[{"source_prefix": "quiet/", "enabled": False}],
    )
    assert s.get("disabled") is True
    assert engine.count() == 3


def test_extraction_writes_are_batched_and_bounded(spark, tmp_path, monkeypatch):
    """The scale gate (round-3 verdict item 1): a many-fact extraction
    issues a FIXED number of write jobs — one add, one set_flags, one
    delete, one add_links — and never collects an O(corpus) row set
    (the old path collected every pinned/archived id in the store).
    Corpus: 400 rows, 396 of them pinned; facts: 24 mixed actions."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    # patch the CONCRETE DataFrame class (pyspark 4 routes the public
    # pyspark.sql.DataFrame to a classic/connect subclass whose own
    # collect would shadow a base-class patch)
    DataFrame = type(eng.table("memories"))
    rows = [
        {"text": f"corpus filler fact number {i} entry", "source": f"bulk/f{i % 7}",
         "pinned": True, "embedding": mock_embed(f"corpus filler fact number {i} entry")}
        for i in range(396)
    ]
    rows += [
        {"text": f"deletable topic {w} note", "source": "live/x",
         "embedding": mock_embed(f"deletable topic {w} note")}
        for w in ("alpha", "beta", "gamma", "delta")
    ]
    eng.add(rows, NOW)

    transcript = "\n".join(
        [f"FACT: fresh standalone insight {i} about subsystem {i}" for i in range(18)]
        + [f"FACT: deletable topic {w} note updated today" for w in ("alpha", "beta")]
        + ["DELETE: deletable topic gamma note", "DELETE: deletable topic delta note"]
        + ["FACT: corpus filler fact number 3 entry"]  # NOOP (dup of pinned row)
        + ["CONFLICT: deletable topic alpha note is wrong"]
    )

    calls = {"add": 0, "set_flags": 0, "delete": 0, "add_links": 0}
    collected: list[int] = []
    orig = {k: getattr(MemoriesEngine, k) for k in calls}
    orig_collect = DataFrame.collect

    def counting(name):
        def wrap(self, *a, **kw):
            calls[name] += 1
            return orig[name](self, *a, **kw)
        return wrap

    def measured_collect(self):
        out = orig_collect(self)
        collected.append(len(out))
        return out

    for k in calls:
        monkeypatch.setattr(MemoriesEngine, k, counting(k))
    monkeypatch.setattr(DataFrame, "collect", measured_collect)
    s = run_extraction(eng, transcript, MockProvider(), "live/x", LATER)
    monkeypatch.undo()

    assert s["added"] == 18 and s["updated"] == 2
    assert s["deleted"] == 2 and s["noop"] == 1 and s["conflict"] == 1
    # O(1) write jobs regardless of fact count
    assert calls == {"add": 1, "set_flags": 1, "delete": 1, "add_links": 1}
    # every driver collect is O(facts), never O(corpus): the largest
    # legitimate set is the 24-fact top-5 similarity hit list (~120);
    # the old protected-set collect would be 396+ rows here
    assert max(collected) <= 150, collected
    # actions really landed
    assert eng.get([396]).collect()[0].archived is True  # updated row
    assert eng.get([398]).count() == 0  # deleted


# ---------------------------------------------------------------------
# Single-call extraction mode (reference extraction_profiles.py:12 +
# llm_extract.py:494-533, dispatch :863-875; test twin of the
# reference's tests/test_single_call_extraction.py)
# ---------------------------------------------------------------------


def test_single_call_returns_add_noop_only():
    """The fused call has no memory context: DELETE/CONFLICT
    directives are DEMOTED to ADD (reference demotes UPDATE/DELETE/
    CONFLICT to ADD, llm_extract.py:526-528); NOOP models the
    generic-knowledge skip."""
    p = MockProvider()
    actions = p.extract_and_decide(
        "FACT: alpha | decision\nDELETE: beta\nCONFLICT: gamma\nNOOP: delta\n"
    )
    assert [a["action"] for a in actions] == ["ADD", "ADD", "ADD", "NOOP"]
    assert [a["text"] for a in actions] == ["alpha", "beta", "gamma", "delta"]
    assert actions[0]["category"] == "decision"


def test_single_call_profile_dispatch_one_provider_call(engine):
    """A single_call profile must route through extract_and_decide
    exactly once: no extract_facts call, no decide calls, no
    similar-memory lookup, ADD/NOOP outcomes only, token accounting
    under the single_call stage key."""
    p = MockProvider()
    s = run_extraction(
        engine,
        "FACT: the api uses port 7443\nNOOP: water is wet\nFACT: novel cadence fact",
        p, "proj/net", LATER,
        profiles=[{"source_prefix": "proj/", "single_call": True}],
    )
    # exactly ONE provider interaction, the fused one
    assert p.calls == [("<single_call>", 0)]
    assert p.modes == ["standard"]
    # degraded semantics: the near-duplicate "port 7443" fact is ADDED
    # (no memory context -> no NOOP-by-similarity), the NOOP directive
    # noops, nothing updates/deletes/conflicts
    assert s["added"] == 2 and s["noop"] == 1
    assert s["updated"] == 0 and s["deleted"] == 0 and s["conflict"] == 0
    assert set(s["tokens"]) == {"single_call"}
    assert s["tokens"]["single_call"]["input"] > 0
    # no auto-linking in single-call mode (reference pins
    # links_created == [])
    for nid in s["new_ids"]:
        assert engine.get_links(nid, "out").count() == 0


def test_single_call_outcomes_recorded_and_stored(engine):
    p = MockProvider()
    before = engine.count()
    s = run_extraction(
        engine, "FACT: brand new single call fact", p, "proj/x", LATER,
        profiles=[{"source_prefix": "proj/", "single_call": True}],
    )
    assert [d["action"] for d in s["decisions"]] == ["ADD"]
    assert engine.count() == before + 1
    row = engine.get(s["new_ids"]).collect()[0]
    assert row.text == "brand new single call fact"


def test_two_stage_tokens_stage_keyed(engine):
    p = MockProvider()
    s = run_extraction(engine, "FACT: some new fact", p, "proj/x", LATER)
    assert set(s["tokens"]) == {"extract", "audn"}
    assert s["tokens"]["extract"]["input"] == 4  # whitespace tokens
    assert s["tokens"]["audn"]["output"] == 1


def test_profile_mode_reaches_provider(engine):
    """Task: the resolved profile's mode must reach the provider
    (reference extraction_profiles.py:8 — prompt-side knob)."""
    p = MockProvider()
    run_extraction(
        engine, "FACT: mode test fact", p, "proj/net", LATER,
        profiles=[{"source_prefix": "proj/net", "mode": "aggressive"}],
    )
    assert p.modes == ["aggressive"]
    p2 = MockProvider()
    run_extraction(engine, "FACT: default mode fact two", p2, "other/src", LATER)
    assert p2.modes == ["standard"]


def test_legacy_provider_without_mode_kw_still_works(engine):
    """Providers predating the mode pass-through (extract_facts without
    the keyword) must keep working via the TypeError fallback."""

    class LegacyProvider:
        def extract_facts(self, transcript):
            return [{"text": "legacy fact", "category": "detail",
                     "directive": "FACT"}]

        def decide(self, fact, similar, bands=None):
            return {"action": "ADD", "target_id": None}

    s = run_extraction(engine, "anything", LegacyProvider(), "proj/x", LATER)
    assert s["added"] == 1


def test_debug_trace_shape(engine):
    """debug=True returns the reference's per-stage trace
    (llm_extract.py:994-1046): extracted facts, per-decision similar
    memories + resulting ids, execution summary."""
    p = MockProvider()
    s = run_extraction(
        engine,
        "FACT: the api uses port 7443\nFACT: wholly novel debug fact\n"
        "DELETE: pinned secret fact",
        p, "proj/net", LATER, debug=True,
    )
    tr = s["debug_trace"]
    assert [f["text"] for f in tr["extracted_facts"]] == [
        "the api uses port 7443", "wholly novel debug fact",
        "pinned secret fact",
    ]
    by_idx = {e["fact_index"]: e for e in tr["audn_decisions"]}
    assert by_idx[0]["action"] == "NOOP" and by_idx[0]["existing_id"] == 0
    assert by_idx[0]["similar_memories"][0]["id"] == 0
    assert by_idx[1]["action"] == "ADD" and by_idx[1]["new_id"] in s["new_ids"]
    # the pinned DELETE target is blocked, and the trace says so
    assert by_idx[2]["action"] == "DELETE" and by_idx[2].get("blocked") is True
    ex = tr["execution_summary"]
    assert ex["added"] == [by_idx[1]["new_id"]]
    assert ex["deleted"] == [] and ex["noops"] == 1 and ex["conflicts"] == 0


def test_no_debug_trace_by_default(engine):
    p = MockProvider()
    s = run_extraction(engine, "FACT: trace-free fact", p, "proj/x", LATER)
    assert "debug_trace" not in s


def test_mode_aware_provider_internal_typeerror_not_retried(engine):
    """A TypeError raised INSIDE a mode-aware provider must propagate,
    not trigger a second (billed, side-effecting) extract call — the
    legacy-signature fallback is decided by signature inspection."""

    class BuggyProvider:
        def __init__(self):
            self.n_calls = 0

        def extract_facts(self, transcript, mode="standard"):
            self.n_calls += 1
            raise TypeError("bug inside the provider body")

        def decide(self, fact, similar, bands=None):
            return {"action": "ADD", "target_id": None}

    p = BuggyProvider()
    with pytest.raises(TypeError, match="inside the provider"):
        run_extraction(engine, "FACT: x", p, "proj/x", LATER)
    assert p.n_calls == 1


def test_dry_run_debug_returns_pre_execution_trace(engine):
    p = MockProvider()
    s = run_extraction(
        engine, "FACT: the api uses port 7443\nFACT: novel dry debug fact",
        p, "proj/net", LATER, dry_run=True, debug=True,
    )
    tr = s["debug_trace"]
    assert [f["text"] for f in tr["extracted_facts"]] == [
        "the api uses port 7443", "novel dry debug fact"]
    by_idx = {e["fact_index"]: e for e in tr["audn_decisions"]}
    assert by_idx[0]["action"] == "NOOP"
    assert by_idx[0]["similar_memories"][0]["id"] == 0
    assert tr["execution_summary"] is None  # nothing executed
    assert engine.count() == 3  # dry run mutated nothing
