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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="memories-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

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
            }
        )
    )


if __name__ == "__main__":
    main()
