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

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "canary_ratio": canary_ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
