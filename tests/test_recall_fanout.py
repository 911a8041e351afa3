"""SessionStart / SubagentStart recall fan-out (reference
plugin/hooks/memory-recall.sh:85-160 and
memory-subagent-recall.sh:59-110): per-prefix canned queries,
per-prefix result budgets, unique-by-id merge capped at the hook's
recall limit, unscoped fallback, and the dedicated deferred-work
surfacing. The grammar tests pin the shell case tables verbatim."""

from __future__ import annotations

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.functions.keywords import (
    query_for_agent_type,
    recall_limit_for_prefix,
    recall_query_for_prefix,
    subagent_limit_for_prefix,
)
from memories_spark.search import (
    deferred_work_recall,
    release_caches,
    session_recall_search,
    subagent_recall_search,
)

NOW = "2024-06-01 12:00:00"


def test_recall_query_for_prefix_case_table():
    """memory-recall.sh:85-101 — per-prefix canned queries; the shell
    `pattern/*` glob is a starts-with on the substituted prefix."""
    assert recall_query_for_prefix("claude-code/proj", "proj") == (
        "project proj architecture decisions conventions patterns")
    assert recall_query_for_prefix("codex/proj", "proj") == (
        "project proj architecture decisions conventions patterns")
    assert recall_query_for_prefix("learning/proj", "proj") == (
        "project proj fixes gotchas learnings workarounds")
    assert recall_query_for_prefix("wip/proj", "proj") == (
        "project proj deferred work blockers open threads revisit later")
    assert recall_query_for_prefix("decision/proj", "proj") == (
        "project proj conventions decisions patterns")


def test_recall_limit_case_table():
    """memory-recall.sh:110-114 — client-family 4, learning/wip 2,
    default 3; memory-subagent-recall.sh:86-90 — learning/wip 2,
    everything else (client families included) 3."""
    assert recall_limit_for_prefix("claude-code/p") == 4
    assert recall_limit_for_prefix("codex/p") == 4
    assert recall_limit_for_prefix("learning/p") == 2
    assert recall_limit_for_prefix("wip/p") == 2
    assert recall_limit_for_prefix("decision/p") == 3
    assert subagent_limit_for_prefix("claude-code/p") == 3
    assert subagent_limit_for_prefix("codex/p") == 3
    assert subagent_limit_for_prefix("learning/p") == 2
    assert subagent_limit_for_prefix("wip/p") == 2
    assert subagent_limit_for_prefix("decision/p") == 3


def test_query_for_agent_type_case_table():
    """memory-subagent-recall.sh:59-75 — Plan/Explore exact,
    reviewer agents by substring, generic default."""
    assert query_for_agent_type("Plan", "p") == (
        "project p architecture decisions design constraints deferred work")
    assert query_for_agent_type("Explore", "p") == (
        "project p structure conventions patterns file organization")
    for at in ("code-reviewer", "my-code-reviewer-v2", "review",
               "security-reviewer"):
        assert query_for_agent_type(at, "p") == (
            "project p conventions code style patterns known issues"), at
    # exact-match arms do NOT fire on substrings
    assert query_for_agent_type("Planner", "p") == (
        "project p architecture decisions conventions patterns")
    assert query_for_agent_type("", "p") == (
        "project p architecture decisions conventions patterns")


def _rec(text, source):
    return {"text": text, "source": source, "embedding": mock_embed(text)}


def _store(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [
            _rec("service architecture uses event sourcing",
                 "claude-code/proj"),
            _rec("decision to pin the schema registry version",
                 "codex/proj"),
            _rec("gotcha: the retry queue drops duplicate acks",
                 "learning/proj"),
            _rec("deferred: migrate the audit log writer", "wip/proj"),
            _rec("blocked: waiting on the quota bump", "wip/proj"),
            _rec("unrelated grocery list", "home/misc"),
        ],
        NOW,
    )
    return eng


def test_session_recall_fanout(spark, tmp_path):
    """One scoped search per default prefix template with the canned
    per-prefix query, merged unique-by-id and capped at 8; the
    out-of-scope record never appears (memory-recall.sh:103-135)."""
    eng = _store(spark, tmp_path)
    df = session_recall_search(
        eng, "proj", scoped_threshold=None, auto_intent=False, now=NOW)
    rows = df.collect()
    release_caches(df)
    assert rows and len(rows) <= 8
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r.source != "home/misc" for r in rows)
    strategies = {r.strategy for r in rows}
    assert strategies <= {
        "scoped:claude-code/proj", "scoped:codex/proj",
        "scoped:learning/proj", "scoped:wip/proj"}
    # the wip-scoped hits came from the deferred-work canned query
    assert any(r.source == "wip/proj" for r in rows)


def test_session_recall_fallback(spark, tmp_path):
    """An empty fan-out triggers ONE unscoped 'project conventions'
    fallback at k=6 (memory-recall.sh:137-140)."""
    eng = _store(spark, tmp_path)
    df = session_recall_search(
        eng, "otherproj", scoped_threshold=0.999,
        fallback_threshold=None, auto_intent=False, now=NOW)
    rows = df.collect()
    release_caches(df)
    assert rows and all(r.strategy == "fallback" for r in rows)


def test_deferred_work_recall(spark, tmp_path):
    """The dedicated wip/{project} surfacing (memory-recall.sh:
    153-160): k=5, threshold 0.3, scope-only — both wip records and
    nothing else."""
    eng = _store(spark, tmp_path)
    df = deferred_work_recall(eng, "proj", threshold=None,
                              auto_intent=False, now=NOW)
    rows = df.collect()
    release_caches(df)
    assert rows and all(r.source == "wip/proj" for r in rows)
    assert len(rows) <= 5


def test_subagent_recall_agent_query(spark, tmp_path):
    """Subagent fan-out (memory-subagent-recall.sh:77-105): same
    prefix queue, ONE agent-type-tailored query across branches,
    capped at 6; scope exclusion holds."""
    eng = _store(spark, tmp_path)
    df = subagent_recall_search(
        eng, "Plan", "proj", threshold=None, auto_intent=False, now=NOW)
    rows = df.collect()
    release_caches(df)
    assert rows and len(rows) <= 6
    assert all(r.source != "home/misc" for r in rows)
    strategies = {r.strategy for r in rows}
    assert strategies <= {
        "scoped:claude-code/proj", "scoped:codex/proj",
        "scoped:learning/proj", "scoped:wip/proj"}


def test_subagent_recall_fallback_uses_agent_query(spark, tmp_path):
    """Empty subagent fan-out falls back to the SAME agent-type
    query unscoped, k=5 (memory-subagent-recall.sh:107-110)."""
    eng = _store(spark, tmp_path)
    df = subagent_recall_search(
        eng, "Explore", "otherproj", threshold=0.999,
        fallback_threshold=None, auto_intent=False, now=NOW)
    rows = df.collect()
    release_caches(df)
    assert rows and all(r.strategy == "fallback" for r in rows)
