"""Active memory-search behavior eval twin (reference
eval/active_search_eval.py:1-196, a 5.4.0 headline feature):
deterministic scoring of tool-call traces — did the agent search when
the turn depended on prior context, with the right source prefix, did
the answer use the memory, and did control cases stay quiet. The same
algebra is oracle-checked as the ``active_search_scores`` registry
query; this file pins the Python scorer to identical outputs on that
panel plus the trace-shape edge cases the registry panel can't carry.
"""

from __future__ import annotations

from memories_spark.evals import (
    ActiveSearchCase,
    is_memory_search_tool_name,
    score_active_search_turn,
    summarize_active_search,
)
from memories_spark.plans.queries_eval import _AS_PANEL


def _panel_cases() -> dict:
    """Reassemble the registry panel's long rows into (case, trace,
    answer) triples so the Python scorer replays the exact inputs the
    oracle scores."""
    cases: dict[str, dict] = {}
    for cid, should, e1, e2, t1, t2, cname, cprefix, answer in _AS_PANEL:
        c = cases.setdefault(cid, {
            "should": should,
            "prefixes": tuple(p for p in (e1, e2) if p),
            "terms": tuple(t for t in (t1, t2) if t),
            "answer": answer,
            "calls": [],
        })
        if cname:
            call = {"name": cname}
            if cprefix:
                call["source_prefix"] = cprefix
            c["calls"].append(call)
    return cases


def test_tool_name_rule():
    # reference MEMORY_SEARCH_TOOL_NAMES + endswith("__memory_search")
    assert is_memory_search_tool_name("memory_search")
    assert is_memory_search_tool_name("mcp__memories__memory_search")
    assert is_memory_search_tool_name("anyclient__memory_search")
    assert not is_memory_search_tool_name("memory_get")
    assert not is_memory_search_tool_name("memory_search_v2")


def test_scorer_matches_registry_panel(spark):
    """The Python scorer and the oracle-checked registry query are the
    SAME algebra: identical per-case score, prefix score, and flags on
    every panel case."""
    from memories_spark.plans.registry import QUERIES

    rows = {
        r.case_id: r
        for r in QUERIES["active_search_scores"].fn(spark, "").collect()
    }
    for cid, c in sorted(_panel_cases().items()):
        case = ActiveSearchCase(
            case_id=cid, user_prompt="q", should_search=c["should"],
            expected_source_prefixes=c["prefixes"],
            expected_answer_terms=c["terms"],
        )
        got = score_active_search_turn(
            case, c["answer"], {"tool_calls": c["calls"]}
        )
        want = rows[cid]
        assert got["memory_search_called"] == want.memory_search_called, cid
        assert got["source_prefix_score"] == want.source_prefix_score, cid
        assert got["answer_used_memory"] == want.answer_used_memory, cid
        assert (
            got["passive_hook_only_failure"] == want.passive_hook_only_failure
        ), cid
        assert abs(got["active_search_score"] - want.active_search_score) < 1e-9, cid


def test_score_algebra_pinned():
    """Reference score_turn semantics (active_search_eval.py:115-129):
    required+searched = 0.5 base, +0.25 prefix, +0.25 answer-use;
    required+missed = 0; control quiet = 1; control searched = 0."""
    case = ActiveSearchCase(
        "a", "q", True, expected_source_prefixes=("proj/x",),
        expected_answer_terms=("port 9",),
    )
    full = score_active_search_turn(
        case, "we use port 9",
        {"tool_calls": [{"name": "memory_search", "source_prefix": "proj/x"}]},
    )
    assert full["active_search_score"] == 1.0 and full["issues"] == []
    missed = score_active_search_turn(case, "we use port 9", {"tool_calls": []})
    assert missed["active_search_score"] == 0.0
    assert "missing_memory_search" in missed["issues"]
    assert missed["passive_hook_only_failure"]  # answer had the term anyway
    wrong = score_active_search_turn(
        case, "we use port 9",
        {"tool_calls": [{"name": "memory_search", "source_prefix": "other"}]},
    )
    assert wrong["active_search_score"] == 0.75
    assert "wrong_source_prefix" in wrong["issues"]
    control = ActiveSearchCase("b", "hi", False)
    quiet = score_active_search_turn(control, "hello", {"tool_calls": []})
    assert quiet["active_search_score"] == 1.0
    noisy = score_active_search_turn(
        control, "hello", {"tool_calls": [{"name": "memory_search"}]}
    )
    assert noisy["active_search_score"] == 0.0
    assert "unnecessary_memory_search" in noisy["issues"]


def test_memory_get_is_not_a_search():
    """The memory_get bypass (the reference hook's 'Do not use
    memory_get as a substitute'): fetching by id scores as NO search."""
    case = ActiveSearchCase("g", "q", True)
    got = score_active_search_turn(
        case, "answer", {"tool_calls": [{"name": "memory_get", "id": 3}]}
    )
    assert not got["memory_search_called"]
    assert got["active_search_score"] == 0.0


def test_nested_prefix_gets_credit():
    """_source_matches (:49-56): searching UNDER an expected prefix
    (expected + '/...') earns the prefix credit; a sibling does not."""
    case = ActiveSearchCase(
        "n", "q", True, expected_source_prefixes=("proj/alpha",)
    )
    under = score_active_search_turn(case, "", {"tool_calls": [
        {"name": "memory_search", "source_prefix": "proj/alpha/svc"}]})
    assert under["source_prefix_score"] == 1.0
    sibling = score_active_search_turn(case, "", {"tool_calls": [
        {"name": "memory_search", "source_prefix": "proj/alphabet"}]})
    assert sibling["source_prefix_score"] == 0.0


def test_malformed_trace_is_no_calls():
    case = ActiveSearchCase("m", "q", True)
    for trace in (None, [], "nope", {"tool_calls": "x"}, {"tool_calls": [7]}):
        got = score_active_search_turn(case, "", trace)
        assert not got["memory_search_called"], trace


def test_summarize_active_search():
    case_hit = ActiveSearchCase("h", "q", True)
    case_ctl = ActiveSearchCase("c", "hi", False)
    results = [
        score_active_search_turn(
            case_hit, "a", {"tool_calls": [{"name": "memory_search"}]}
        ),
        score_active_search_turn(case_hit, "a", {"tool_calls": []}),
        score_active_search_turn(case_ctl, "a", {"tool_calls": []}),
    ]
    s = summarize_active_search(results)
    assert s["cases"] == 3 and s["required_cases"] == 2
    assert s["active_search_rate"] == 0.5
    assert s["unnecessary_memory_searches"] == 0
    assert s["overall_active_search_score"] == round((1.0 + 0.0 + 1.0) / 3, 4)
    empty = summarize_active_search([])
    assert empty["cases"] == 0 and empty["overall_active_search_score"] == 0.0
