"""Load-test harness twin (reference benchmarks/load_test.py:1-21):
scenario mix, percentile report shape, zero-error runs, and the
mixed-scenario mutation/search interleave against one live store."""

from __future__ import annotations

import pytest

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.loadtest import MIXED_WEIGHTS, _percentile, run_load

NOW = "2026-04-01 12:00:00"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    eng = MemoriesEngine(spark, str(tmp_path_factory.mktemp("load") / "store"))
    rows = []
    for i in range(120):
        text = f"corpus note {i}: service {i % 6} uses pattern {i % 4} for requests"
        rows.append({"text": text, "source": f"corp/s{i % 6}",
                     "embedding": mock_embed(text)})
    eng.add(rows, NOW)
    return eng


def test_percentile_nearest_rank():
    vals = sorted(float(v) for v in range(1, 101))
    assert _percentile(vals, 0.50) == 51.0  # nearest rank over 0..99 idx
    assert _percentile(vals, 0.99) == 99.0
    assert _percentile([], 0.5) == 0.0


def test_search_scenario_report_shape(store):
    rep = run_load(store, scenario="search", concurrency=4, ops=12, now=NOW)
    assert rep["ops"] == 12 and rep["errors"] == []
    s = rep["operations"]["search"]
    assert s["count"] == 12 and s["errors"] == 0
    assert 0 < s["p50_ms"] <= s["p95_ms"] <= s["p99_ms"] <= s["max_ms"]
    assert rep["ops_per_sec"] > 0


def test_mixed_scenario_mutates_and_searches(store):
    """70/20/10 search/add/delete against a live store: all ops
    succeed, the mix roughly follows the weights, and the store ends
    consistent (adds minus deletes of added rows)."""
    before = store.count()
    rep = run_load(store, scenario="mixed", concurrency=4, ops=30, now=NOW, seed=7)
    assert rep["errors"] == []
    ops = rep["operations"]
    assert set(ops) <= {name for name, _ in MIXED_WEIGHTS}
    assert ops["search"]["count"] > ops.get("add", {}).get("count", 0)
    n_add = ops.get("add", {}).get("count", 0)
    n_del = ops.get("delete", {}).get("count", 0)
    after = store.count()
    # deletes target previously-added rows (or no-op on a miss), so
    # the seed corpus is never shrunk below its size
    assert after >= before and after <= before + n_add
    assert before + n_add - n_del <= after


def test_extract_scenario_runs_pipeline(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "exstore"))
    eng.add([{"text": "seed fact", "source": "corp/a",
              "embedding": mock_embed("seed fact")}], NOW)
    rep = run_load(eng, scenario="extract", concurrency=2, ops=4, now=NOW)
    assert rep["errors"] == []
    assert rep["operations"]["extract"]["count"] == 4
    # each extraction adds its two facts once; re-extractions NOOP as
    # duplicates, so the store grew by exactly the distinct fact count
    assert eng.count() >= 3


def test_unknown_scenario_rejected(store):
    with pytest.raises(ValueError):
        run_load(store, scenario="bogus")
