"""Every registered query must match its DuckDB oracle at sf0.001.

This is the local twin of the driver's CORRECTNESS gate (which runs
at sf0.01); a failure here means a failure there.

Queries run in THREADED shards: Spark schedules concurrent jobs from
one session across its executor threads, so 8 in-flight queries cut
wall time ~4-6x versus one-at-a-time (each query is a small job that
leaves most cores idle). Each shard asserts ALL its failures at once
so a red run still names every broken query.

Plan CONSTRUCTION is serialized under a lock: building a DataFrame
plan is py4j-call-heavy (every higher-order-function lambda round-
trips the gateway), and hammering the gateway from 12 threads at once
intermittently corrupted it (a segfault inside py4j send_command —
the cause of this suite's historical one-shard-in-two-runs flake).
Only EXECUTION (toPandas + the DuckDB oracle) runs concurrently —
that is where all the wall time is anyway."""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from memories_spark.plans.registry import QUERIES
from tests.parity import compare

_BUILD_LOCK = threading.Lock()

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
NO_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is None)

SHARD = 32
POOL = 12


def _shards(names):
    # always at least one (possibly empty) shard: an empty parametrize
    # list breaks id resolution, and a skip is clearer anyway
    return [names[i : i + SHARD] for i in range(0, len(names), SHARD)] or [[]]


def _shard_id(s):
    return f"{s[0]}..{s[-1]}[{len(s)}]" if s else "empty"


@pytest.mark.parametrize("shard", _shards(ORACLE_QUERIES), ids=_shard_id)
def test_queries_match_oracle(spark, sf_dir, shard):
    if not shard:
        pytest.skip("no queries in this class")

    def run(name):
        spec = QUERIES[name]
        try:
            with _BUILD_LOCK:
                df = spec.fn(spark, sf_dir)
            ok, msg = compare(df, spec.oracle, sf_dir)
        except Exception as e:  # surface crashes as failures, keep batch going
            ok, msg = False, f"raised {type(e).__name__}: {e}"
        return name, ok, msg

    with ThreadPoolExecutor(POOL) as ex:
        results = list(ex.map(run, shard))
    failures = [f"{n}: {m}" for n, ok, m in results if not ok]
    assert not failures, "\n".join(failures)


@pytest.mark.parametrize("shard", _shards(NO_ORACLE), ids=_shard_id)
def test_queries_run(spark, sf_dir, shard):
    if not shard:
        pytest.skip("no queries in this class")

    def run(name):
        try:
            with _BUILD_LOCK:
                df = QUERIES[name].fn(spark, sf_dir)
            return name, df.count() >= 0, "ok"
        except Exception as e:
            return name, False, f"raised {type(e).__name__}: {e}"

    with ThreadPoolExecutor(POOL) as ex:
        results = list(ex.map(run, shard))
    failures = [f"{n}: {m}" for n, ok, m in results if not ok]
    assert not failures, "\n".join(failures)
