"""Efficacy-eval harness: scenario YAML + weighted rubric scorer +
with/without-memory delta.

Twin of the reference's efficacy eval (reference eval/scorer.py —
deterministic rubric types ``contains`` / ``not_contains`` /
``no_retry`` scored as a weighted average, LLM-judge types excluded
via a -1 sentinel; eval/runner.py — each scenario runs the assistant
WITHOUT memories, then seeds the scenario's memories and runs WITH,
and the report aggregates the per-category and overall score delta;
scenario shape eval/scenarios/*/*.yaml). The reference's published
headline is the with-memory minus without-memory delta over its 11
Voltis scenarios (docs/architecture.md:299-331).

The assistant here is MOCKED deterministically, exactly as the
round-3 review prescribed: the with-memory "answer" is the
concatenation of the top-k texts retrieved by the real
``hybrid_search`` stack over a store seeded with the scenario's
memories, plus a declarative closing; the without-memory answer is a
fixed clarifying reply (which contains a question mark, so the
reference's ``no_retry`` rubric behaves exactly as designed). That
makes the delta a pure function of retrieval quality — the thing this
engine owns — with zero network or model variance.

Scenarios are ORIGINAL content in the reference's YAML shape
(id / category / name / memories / prompt / expected), shipped under
``memories_spark/eval_scenarios/``. The rubric-scoring algebra is
additionally registered as an oracle-checked query
(``efficacy_rubric_scores`` in plans/queries_eval.py) so DuckDB
replays the weighted-average math over the same scenario literals.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

#: Rubric types resolved by an LLM judge in the reference
#: (eval/scorer.py LLM_JUDGE_TYPES): scored with a -1 sentinel and
#: EXCLUDED from the deterministic weighted average.
LLM_JUDGE_TYPES = {"correct_fix", "recall_accuracy", "match_convention"}

SCENARIO_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "eval_scenarios")

#: The deterministic stand-ins for the reference's CC executor runs.
WITHOUT_MEMORY_REPLY = (
    "I don't have enough project-specific context to answer this "
    "definitively. Could you share the relevant conventions, ports, "
    "owners, or prior decisions?"
)
WITH_MEMORY_SUFFIX = (
    " Based on the retrieved project memory above, that is the "
    "established convention to follow."
)


@dataclass
class Rubric:
    type: str
    value: str
    weight: float = 1.0


@dataclass
class Scenario:
    id: str
    category: str
    name: str
    prompt: str
    memories: list[dict] = field(default_factory=list)
    expected: list[Rubric] = field(default_factory=list)


def _parse_scenario_yaml(text: str) -> dict:
    """Minimal parser for the restricted YAML subset the scenario
    files use (scalar keys, one level of list-of-dicts, double-quoted
    or plain scalars, full-line comments) — the fallback when PyYAML
    isn't importable, so a missing optional dep can never take the
    query registry down with it."""
    def scalar(v: str):
        v = v.strip()
        if v.startswith('"') and v.endswith('"') and len(v) >= 2:
            return v[1:-1]
        try:
            return float(v) if "." in v else int(v)
        except ValueError:
            return v

    raw: dict = {}
    cur_list = None       # the list under the open block key
    cur_item = None       # the dict item being filled
    for line in text.splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        indent = len(line) - len(line.lstrip())
        stripped = line.strip()
        if indent == 0:
            cur_list = cur_item = None
            key, _, val = stripped.partition(":")
            if val.strip():
                raw[key.strip()] = scalar(val)
            else:
                cur_list = raw.setdefault(key.strip(), [])
        elif stripped.startswith("- ") and cur_list is not None:
            key, _, val = stripped[2:].partition(":")
            cur_item = {key.strip(): scalar(val)}
            cur_list.append(cur_item)
        elif cur_item is not None:
            key, _, val = stripped.partition(":")
            cur_item[key.strip()] = scalar(val)
    return raw


def load_scenarios(root: str = SCENARIO_DIR) -> list[Scenario]:
    """All scenario YAMLs under ``root``, id-ordered (reference
    eval/loader.py reads eval/scenarios/<category>/*.yaml)."""
    try:
        import yaml

        def _load(text: str) -> dict:
            return yaml.safe_load(text)
    except ImportError:  # optional dep: fall back to the subset parser
        _load = _parse_scenario_yaml

    out: list[Scenario] = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if not n.endswith((".yaml", ".yml")):
                continue
            with open(os.path.join(dirpath, n)) as f:
                raw = _load(f.read())
            out.append(
                Scenario(
                    id=raw["id"],
                    category=raw["category"],
                    name=raw.get("name", raw["id"]),
                    prompt=raw["prompt"],
                    memories=list(raw.get("memories") or []),
                    expected=[
                        Rubric(
                            type=e["type"],
                            value=str(e.get("value") or ""),
                            weight=float(e.get("weight", 1.0)),
                        )
                        for e in (raw.get("expected") or [])
                    ],
                )
            )
    return sorted(out, key=lambda s: s.id)


# -- scorer (reference eval/scorer.py, deterministic subset) -----------


def score_rubric(rubric: Rubric, output: str) -> float:
    """One rubric against one output. LLM-judge types return the -1.0
    sentinel (excluded from the average), mirroring the reference's
    pending_llm_judge behavior with no judge attached."""
    if rubric.type in LLM_JUDGE_TYPES:
        return -1.0
    if rubric.type == "contains":
        return 1.0 if rubric.value and rubric.value.lower() in output.lower() else 0.0
    if rubric.type == "not_contains":
        return 0.0 if rubric.value and rubric.value.lower() in output.lower() else 1.0
    if rubric.type == "no_retry":
        return 0.0 if "?" in output else 1.0
    raise ValueError(f"Unknown rubric type: {rubric.type}")


def score_all(rubrics: list[Rubric], output: str) -> float:
    """Weighted average over deterministic rubrics only (score >= 0),
    0.0 when nothing deterministic scored — reference
    score_all_rubrics exactly."""
    scored = [
        (score_rubric(r, output), r.weight)
        for r in rubrics
    ]
    det = [(s, w) for s, w in scored if s >= 0]
    total_w = sum(w for _, w in det)
    if not det or total_w == 0:
        return 0.0
    return sum(s * w for s, w in det) / total_w


# -- mocked assistant + runner (reference eval/runner.py) ---------------


def mock_assistant(prompt: str, retrieved_texts: list[str]) -> str:
    """answers = concatenated top-k texts (+ a declarative closing);
    with no memories, a fixed clarifying reply."""
    if not retrieved_texts:
        return WITHOUT_MEMORY_REPLY
    return " ".join(retrieved_texts) + WITH_MEMORY_SUFFIX


def run_scenario(
    spark: SparkSession, scenario: Scenario, store_path: str, k: int = 5,
    now: str = "2026-04-01 12:00:00",
) -> dict:
    """One scenario, both phases (reference EvalRunner.run_scenario):
    score the mocked assistant without memories, then seed the
    scenario's memories into a FRESH store and score the answer built
    from the real hybrid_search top-k."""
    from memories_spark.engine import MemoriesEngine
    from memories_spark.extraction import mock_embed
    from memories_spark.search import hybrid_search

    score_without = score_all(scenario.expected, mock_assistant(scenario.prompt, []))

    eng = MemoriesEngine(spark, os.path.join(store_path, scenario.id))
    eng.add(
        [
            {"text": m["text"], "source": m.get("source", f"eval/{scenario.id}"),
             "embedding": mock_embed(m["text"])}
            for m in scenario.memories
        ],
        now,
    )
    hits = hybrid_search(
        eng, scenario.prompt, k=k, auto_intent=False, now=now
    ).collect()
    output_with = mock_assistant(scenario.prompt, [r.text for r in hits])
    score_with = score_all(scenario.expected, output_with)
    return {
        "scenario_id": scenario.id,
        "category": scenario.category,
        "score_without": score_without,
        "score_with": score_with,
        "delta": score_with - score_without,
        "output_with": output_with,
    }


def aggregate(results: list[dict]) -> dict:
    """Per-category averages + overall delta (reference
    EvalRunner._aggregate → EvalReport)."""
    by_cat: dict[str, list[dict]] = {}
    for r in results:
        by_cat.setdefault(r["category"], []).append(r)
    categories = {
        cat: {
            "n": len(rs),
            "avg_with": sum(r["score_with"] for r in rs) / len(rs),
            "avg_without": sum(r["score_without"] for r in rs) / len(rs),
        }
        for cat, rs in sorted(by_cat.items())
    }
    n = len(results)
    avg_with = sum(r["score_with"] for r in results) / n if n else 0.0
    avg_without = sum(r["score_without"] for r in results) / n if n else 0.0
    return {
        "scenarios": n,
        "categories": categories,
        "avg_with": avg_with,
        "avg_without": avg_without,
        "delta": avg_with - avg_without,
    }


# ---------------------------------------------------------------------
# Active memory-search behavior eval
# (reference eval/active_search_eval.py:1-196, a 5.4.0 headline)
# ---------------------------------------------------------------------

#: tool names that count as a memory search (reference
#: MEMORY_SEARCH_TOOL_NAMES + the ``endswith("__memory_search")``
#: MCP-prefix rule, active_search_eval.py:14-17, 41-42)
MEMORY_SEARCH_TOOL_NAMES = {"memory_search", "mcp__memories__memory_search"}


@dataclass(frozen=True)
class ActiveSearchCase:
    """A user turn with the expected active-search behavior
    (reference ActiveSearchCase, active_search_eval.py:21-31)."""

    case_id: str
    user_prompt: str
    should_search: bool
    expected_source_prefixes: tuple = ()
    expected_answer_terms: tuple = ()
    agent: str = "unknown"


def is_memory_search_tool_name(name: str) -> bool:
    return name in MEMORY_SEARCH_TOOL_NAMES or name.endswith("__memory_search")


def _as_tool_calls(trace) -> list[dict]:
    if not isinstance(trace, dict):
        return []
    calls = trace.get("tool_calls", [])
    if not isinstance(calls, list):
        return []
    return [c for c in calls if isinstance(c, dict)]


def _source_matches(searched: str, expected: tuple) -> bool:
    """Exact-prefix credit (active_search_eval.py:49-56): the searched
    prefix must equal an expected one or live under it."""
    if not searched:
        return False
    return any(
        searched == e or searched.startswith(f"{e}/") for e in expected
    )


def score_active_search_turn(
    case: ActiveSearchCase, agent_response: str, agent_trace
) -> dict:
    """Deterministic scoring of one tool-call trace (reference
    score_turn, active_search_eval.py:72-154): did the agent search
    when a turn depended on prior context (0.5 credit), with the right
    source prefix (+0.25), and did the answer use the expected memory
    (+0.25)? Control cases (should_search=False) score 1.0 unless an
    unnecessary search fired. ``memory_get`` never substitutes for a
    search (the bypass non-compliance the reference hook warns about).
    ``passive_hook_only_failure`` flags answers that contain expected
    terms WITHOUT a search — memory that arrived via a passive hook
    injection, the behavior gap this eval exists to catch."""
    calls = _as_tool_calls(agent_trace)
    search_calls = [
        c for c in calls if is_memory_search_tool_name(str(c.get("name", "")))
    ]
    searched_prefixes = [
        str(c.get("source_prefix", ""))
        for c in search_calls
        if str(c.get("source_prefix", ""))
    ]
    called = bool(search_calls)

    if not case.expected_source_prefixes:
        prefix_score = 1.0 if called else 0.0
    else:
        prefix_score = 1.0 if any(
            _source_matches(p, case.expected_source_prefixes)
            for p in searched_prefixes
        ) else 0.0

    folded = (agent_response or "").lower()
    terms = case.expected_answer_terms
    answer_used = all(t.lower() in folded for t in terms) if terms else True
    answer_any = any(t.lower() in folded for t in terms) if terms else False
    passive_failure = bool(case.should_search and not called and answer_any)

    issues: list[str] = []
    if case.should_search and not called:
        issues.append("missing_memory_search")
    if case.should_search and called and prefix_score == 0.0:
        issues.append("wrong_source_prefix")
    if case.should_search and called and not answer_used and terms:
        issues.append("answer_did_not_use_expected_memory")
    if passive_failure:
        issues.append("passive_hook_only_failure")

    if case.should_search:
        if not called:
            score = 0.0
        else:
            score = 0.5 + 0.25 * prefix_score
            score += 0.25 if answer_used or not terms else 0.0
    else:
        score = 1.0
        if called:
            issues.append("unnecessary_memory_search")
            score = 0.0

    return {
        "case_id": case.case_id,
        "agent": case.agent,
        "should_search": case.should_search,
        "memory_search_called": called,
        "searched_source_prefixes": searched_prefixes,
        "expected_source_prefixes": list(case.expected_source_prefixes),
        "source_prefix_score": prefix_score,
        "answer_used_memory": answer_used,
        "answer_matched_any_expected_term": answer_any,
        "passive_hook_only_failure": passive_failure,
        "active_search_score": round(score, 4),
        "issues": issues,
    }


def summarize_active_search(results: list[dict]) -> dict:
    """Audit-friendly aggregate (reference summarize_results,
    active_search_eval.py:157-196)."""
    total = len(results)
    if not total:
        return {
            "cases": 0, "required_cases": 0, "active_search_rate": 0.0,
            "passive_hook_only_failures": 0,
            "wrong_source_prefix_failures": 0, "answer_use_rate": 0.0,
            "unnecessary_memory_searches": 0,
            "overall_active_search_score": 0.0,
        }
    required = [r for r in results if r.get("should_search", True)]
    n_req = len(required)
    return {
        "cases": total,
        "required_cases": n_req,
        "active_search_rate": (
            sum(1 for r in required if r.get("memory_search_called")) / n_req
            if n_req else 1.0
        ),
        "passive_hook_only_failures": sum(
            1 for r in results if r.get("passive_hook_only_failure")
        ),
        "wrong_source_prefix_failures": sum(
            1 for r in results if "wrong_source_prefix" in r.get("issues", [])
        ),
        "answer_use_rate": sum(
            1 for r in results if r.get("answer_used_memory")
        ) / total,
        "unnecessary_memory_searches": sum(
            1 for r in results
            if not r.get("should_search", True) and r.get("memory_search_called")
        ),
        "overall_active_search_score": round(
            sum(float(r.get("active_search_score", 0.0)) for r in results) / total,
            4,
        ),
    }
