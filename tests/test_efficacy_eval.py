"""Efficacy-eval twin (reference eval/scorer.py + eval/runner.py +
eval/scenarios/*/*.yaml): weighted deterministic rubric scoring and
the with/without-memory delta over the REAL hybrid_search stack, with
the assistant mocked as answers = concatenated top-k retrieved texts
— the round-3 verdict's prescribed construction, so the delta is a
deterministic function of retrieval quality."""

from __future__ import annotations

import pytest

from memories_spark.evals import (
    LLM_JUDGE_TYPES,
    Rubric,
    WITHOUT_MEMORY_REPLY,
    aggregate,
    load_scenarios,
    mock_assistant,
    run_scenario,
    score_all,
    score_rubric,
)

NOW = "2026-04-01 12:00:00"


# -- scorer parity (reference eval/scorer.py) ---------------------------


def test_contains_case_insensitive():
    assert score_rubric(Rubric("contains", "Qb_"), "use qb_export_panel") == 1.0
    assert score_rubric(Rubric("contains", "qb_"), "use flag EXPORT") == 0.0
    assert score_rubric(Rubric("contains", ""), "anything") == 0.0  # empty never hits


def test_not_contains_and_no_retry():
    assert score_rubric(Rubric("not_contains", "8080"), "hit 8614") == 1.0
    assert score_rubric(Rubric("not_contains", "8080"), "8080 is fine") == 0.0
    assert score_rubric(Rubric("no_retry", ""), "here is the answer.") == 1.0
    assert score_rubric(Rubric("no_retry", ""), "could you clarify?") == 0.0


def test_llm_judge_types_sentinel_and_exclusion():
    for t in LLM_JUDGE_TYPES:
        assert score_rubric(Rubric(t, "x"), "anything") == -1.0
    # judge rubrics are excluded from the weighted average
    rubrics = [Rubric("contains", "abc", 1.0), Rubric("recall_accuracy", "x", 9.0)]
    assert score_all(rubrics, "has abc inside") == 1.0
    # nothing deterministic -> 0.0, not a division error
    assert score_all([Rubric("correct_fix", "x", 1.0)], "out") == 0.0
    assert score_all([], "out") == 0.0


def test_weighted_average():
    rubrics = [
        Rubric("contains", "8614", 0.8),
        Rubric("not_contains", "8080 is fine", 0.2),
    ]
    assert score_all(rubrics, "hit port 8614") == 1.0
    assert score_all(rubrics, "no idea") == pytest.approx(0.2)
    assert score_all(rubrics, "8080 is fine I think") == 0.0


def test_unknown_rubric_type_raises():
    with pytest.raises(ValueError):
        score_rubric(Rubric("regex", "x"), "out")


# -- scenarios + runner (reference eval/runner.py) -----------------------


def test_scenarios_load_with_reference_shape():
    scenarios = load_scenarios()
    # the reference's 11-scenario Voltis core + its 6 benchmark
    # scenarios (arch decision, debug pattern, preference,
    # contradiction, noisy extraction, growing store)
    assert len(scenarios) == 17
    cats = {s.category for s in scenarios}
    assert cats == {"recall", "coding", "compounding", "benchmark"}
    for s in scenarios:
        assert s.memories and s.expected and s.prompt
        # every scenario carries at least one deterministic rubric
        assert any(r.type not in LLM_JUDGE_TYPES for r in s.expected)
        for m in s.memories:
            assert m["source"].startswith("eval/")  # reference EVAL_PREFIX


def test_mock_assistant_shapes():
    assert mock_assistant("p", []) == WITHOUT_MEMORY_REPLY
    assert "?" in WITHOUT_MEMORY_REPLY  # no_retry fails without memory
    out = mock_assistant("p", ["fact one", "fact two"])
    assert "fact one" in out and "fact two" in out and "?" not in out


def test_with_memory_beats_without_per_scenario(spark, tmp_path):
    """The headline gate: over the real hybrid_search stack, EVERY
    scenario scores strictly higher with its memories seeded than
    without — and the aggregate delta is large (the reference
    publishes +0.86 over the same construction)."""
    results = [
        run_scenario(spark, s, str(tmp_path / "stores"), now=NOW)
        for s in load_scenarios()
    ]
    for r in results:
        assert r["score_with"] > r["score_without"], r
    report = aggregate(results)
    assert report["scenarios"] == 17
    assert set(report["categories"]) == {"recall", "coding", "compounding", "benchmark"}
    assert report["avg_without"] <= 0.2
    assert report["avg_with"] >= 0.8
    assert report["delta"] >= 0.7
    # per-category deltas all positive
    for cat, agg in report["categories"].items():
        assert agg["avg_with"] > agg["avg_without"], cat


def test_fallback_parser_matches_pyyaml():
    """The subset parser (used when PyYAML is absent) must agree with
    PyYAML on every shipped scenario file — a divergence would change
    the registered oracle literals."""
    import os

    yaml = pytest.importorskip("yaml")
    from memories_spark.evals import SCENARIO_DIR, _parse_scenario_yaml

    n = 0
    for dirpath, _, names in os.walk(SCENARIO_DIR):
        for name in sorted(names):
            if not name.endswith(".yaml"):
                continue
            text = open(os.path.join(dirpath, name)).read()
            assert yaml.safe_load(text) == _parse_scenario_yaml(text), name
            n += 1
    assert n == 17
