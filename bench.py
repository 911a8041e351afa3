"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each headline query is executed three times: a warm-up that also
triggers JIT/codegen + file listing, then two timed runs of which the
minimum is reported — steady-state cost, robust to one-off GC/
scheduler hiccups. The timed number is the full plan execution
including the action (collecting the result), not just lazy plan
construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from memories_spark.plans.registry import QUERIES
from memories_spark.session import get_spark

# Machine-load sentinel: q1 at sf0.1 took 2.22 s on an idle round-1
# machine (BENCH_r01.json). The canary runs FIRST each bench; its
# ratio vs this anchor lands in the JSON so a noisy/loaded run is
# self-labeling instead of reading as a code regression (the round-2
# driver bench inflated ~1.35x across unchanged queries).
_CANARY_QUERY = "q1_pricing_summary"
_CANARY_ANCHOR_SEC = {0.1: 2.22}

# Per-query idle anchors (round-3 verdict item 9): multi-job plans
# (the hybrid stack especially) fluctuate +/-40% run to run, which
# can hide a real regression as noise or report noise as regression.
# bench_anchors.json records each query's idle-machine time per sf;
# every run emits its per-query ratio vs the anchor and flags >1.5x
# drift in the JSON, so the drift signal is per query, not global.
# Regenerate on an idle machine with: python bench.py --record-anchors
_ANCHORS_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_anchors.json")
_DRIFT_WARN = 1.5


def _load_anchors(sf: float) -> dict[str, float]:
    try:
        with open(_ANCHORS_FILE) as f:
            return {k: float(v) for k, v in json.load(f).get(str(sf), {}).items()}
    except (OSError, ValueError):
        return {}


def _record_anchors(sf: float, timings: dict[str, float]) -> None:
    try:
        with open(_ANCHORS_FILE) as f:
            all_anchors = json.load(f)
    except (OSError, ValueError):
        all_anchors = {}
    all_anchors[str(sf)] = {k: v for k, v in timings.items() if v >= 0}
    with open(_ANCHORS_FILE, "w") as f:
        json.dump(all_anchors, f, indent=1, sort_keys=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="memories-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # canary first: warm-up + one timed run of q1, compared to the
    # recorded idle-machine anchor (only meaningful at an anchored sf)
    canary_ratio = None
    anchor = _CANARY_ANCHOR_SEC.get(sf)
    if anchor and _CANARY_QUERY in QUERIES:
        try:
            QUERIES[_CANARY_QUERY].fn(spark, sf_dir).collect()  # warm-up
            t0 = time.perf_counter()
            QUERIES[_CANARY_QUERY].fn(spark, sf_dir).collect()
            canary_ratio = round((time.perf_counter() - t0) / anchor, 3)
            if canary_ratio > 1.2:
                print(
                    f"bench canary: machine looks loaded "
                    f"({_CANARY_QUERY} {canary_ratio}x its idle anchor)",
                    file=sys.stderr,
                )
        except Exception as exc:
            print(f"bench canary failed: {exc}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()

    bench_queries = {n: s for n, s in QUERIES.items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in bench_queries.items():
        try:
            spec.fn(spark, sf_dir).collect()  # warm-up
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 4)
        except Exception as exc:  # keep the bench line intact on partial failure
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # Queries cache intermediates; without releasing them the
            # session accumulates storage across the suite and later
            # queries pay eviction/GC churn instead of their own cost.
            spark.catalog.clearCache()

    # Work-volume labels (round-5 verdict bench hygiene): the slowest
    # bench query is a blocked exact set-similarity join whose cost IS
    # its candidate volume — record that volume so a corpus shift that
    # doubles candidates reads as more verified work, not a regression.
    work_stats: dict = {}
    if timings.get("rareterm_jaccard_join", -1.0) >= 0:
        try:
            from memories_spark.plans.queries_advanced4 import (
                rareterm_work_stats,
            )

            work_stats.update(rareterm_work_stats(spark, sf_dir))
        except Exception as exc:
            print(f"bench work stats failed: {exc}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    anchors = _load_anchors(sf)
    ratios = {
        n: round(t / anchors[n], 3)
        for n, t in timings.items()
        if t >= 0 and anchors.get(n)
    }
    drifted = sorted(n for n, r in ratios.items() if r > _DRIFT_WARN)
    if drifted:
        print(
            f"bench drift: {len(drifted)} queries above {_DRIFT_WARN}x their "
            f"idle anchor: {', '.join(drifted)}",
            file=sys.stderr,
        )
    if "--record-anchors" in sys.argv:
        if canary_ratio is not None and canary_ratio > 1.2:
            print(
                f"anchors NOT recorded: machine loaded (canary {canary_ratio}x) — "
                "anchors must come from an idle run",
                file=sys.stderr,
            )
        else:
            _record_anchors(sf, timings)
            print(f"anchors recorded to {_ANCHORS_FILE}", file=sys.stderr)
    # Key order is deliberate: the headline scalars (value / sf /
    # canary_ratio) come LAST so a tail-truncated capture of this line
    # (the round-7 driver kept only the final ~1.2 kB and lost the
    # leading fields) still contains them; a full capture parses the
    # same either way.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "unit": "sec",
                "queries": timings,
                "anchor_ratios": ratios,
                "drift_warnings": drifted,
                "work_stats": work_stats,
                "value": total,
                "sf": sf,
                "canary_ratio": canary_ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
