"""Per-query timing harness for optimization work (guide §1).

Times each named query exactly like bench.py (warm-up + timed
``collect()`` runs, min reported) inside one session, with a canary
run of q1 first so machine load is visible. Usage:

    python tools/time_queries.py q1_pricing_summary,bm25_topk [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from memories_spark.plans.registry import QUERIES  # noqa: E402
from memories_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1 and sys.argv[1] != "all"
        else [n for n, s in QUERIES.items() if s.bench]
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).collect()
    t0 = time.perf_counter()
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).collect()
    print(f"canary q1: {time.perf_counter() - t0:.3f}s", flush=True)
    spark.catalog.clearCache()

    for name in names:
        spec = QUERIES[name]
        try:
            spec.fn(spark, sf_dir).collect()  # warm-up
            ts, fts = [], []
            for _ in range(runs):
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.collect()
                fts.append(t1 - t0)
                ts.append(time.perf_counter() - t0)
            print(
                f"{min(ts):7.3f}s min  {sorted(ts)[len(ts)//2]:7.3f}s med"
                f"  (fn {min(fts):6.3f}s)  {name}",
                flush=True,
            )
        except Exception as exc:
            print(f"FAIL {name}: {exc}", flush=True)
        finally:
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
