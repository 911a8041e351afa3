"""Load-test harness: concurrent serving workloads over a
MemoriesEngine store with latency percentiles.

Twin of the reference's load harness (reference
benchmarks/load_test.py:1-21 — scenarios ``search`` / ``add`` /
``mixed`` (70% search, 20% add, 10% delete) / ``burst`` /
``extract``, reported as per-operation latency percentiles; the
reference publishes the harness, not numbers). The HTTP layer is
replaced by direct engine calls: searches execute the full
hybrid_search plan per request, mutations go through the engine's
partition-pruned write path, extraction runs the AUDN pipeline on
the deterministic MockProvider.

Concurrency model: searches run genuinely concurrently (Spark
schedules jobs from many threads across its executor pool — the FAIR
pools in fairscheduler.xml exist for exactly this mix); mutations
serialize on a writer lock, mirroring the reference's single-writer
global lock (reference memory_engine.py:155-156) — the engine's
directory-swap writes assume one writer, like the production Delta
mapping assumes one optimistic-concurrency committer per table.

Determinism: operation order and query choice come from a seeded
RNG; latencies are machine-dependent (that is the point of a load
test), so tests gate structure/throughput sanity, not timings.
"""

from __future__ import annotations

import random
import threading
import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

SAMPLE_QUERIES = [
    "how do we rotate session credentials",
    "which table holds invoice line items",
    "when does the nightly rollup job run",
    "who owns the ingest worker pool",
    "what backoff does the webhook sender use",
    "where are feature flags evaluated",
    "how are stale cache entries evicted",
    "what regions serve tenant traffic",
]

SAMPLE_TEXTS = [
    "session credentials rotate every ninety minutes via the token service",
    "invoice line items live in the qrbl_invoice_lines table",
    "the nightly rollup job runs at half past two utc",
    "the ingest worker pool is owned by the pipelines squad",
    "webhook sends back off with jitter up to five retries",
    "feature flags evaluate in the gateway with tenant context",
]

_EXTRACT_TRANSCRIPT = "FACT: deploys are canary first at seven percent\nFACT: rollbacks are one command"

MIXED_WEIGHTS = (("search", 70), ("add", 20), ("delete", 10))


@dataclass
class OpResult:
    op: str
    latency_ms: float
    ok: bool
    error: dict = field(default_factory=dict)


def format_errors(rep: dict) -> str:
    """Render a load report's error payloads for assertion messages /
    logs: one block per failed op with kind, index, query, and the
    full traceback — so a concurrency failure that reproduces once in
    a 35-minute suite run names its cause instead of printing a bare
    ``AssertionError``."""
    blocks = []
    for e in rep.get("errors", []):
        head = f"[{e.get('op')}#{e.get('index')}]"
        if e.get("query"):
            head += f" query={e['query']!r}"
        blocks.append(f"{head} {e.get('error')}\n{e.get('traceback', '')}")
    return "\n".join(blocks)


def _percentile(sorted_vals: list[float], q: float) -> float:
    """Nearest-rank percentile (the reference uses the same simple
    definition for its report)."""
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, max(0, int(round(q * (len(sorted_vals) - 1)))))
    return sorted_vals[idx]


def run_load(
    engine,
    scenario: str = "mixed",
    concurrency: int = 4,
    ops: int = 40,
    k: int = 5,
    now: str = "2026-04-01 12:00:00",
    seed: int = 0,
    indexed: bool = False,
) -> dict:
    """Run ``ops`` operations of ``scenario`` at ``concurrency`` and
    report per-operation latency percentiles + throughput.

    ``indexed=True`` serves searches through the persisted indexes
    (``hybrid_search(ann=True, lexical=True)``) — the production
    serving configuration. The caller builds/refreshes the indexes;
    stale indexes just measure the inline fallback, which is itself a
    legitimate load shape (the post-mutation window)."""
    from memories_spark.extraction import MockProvider, mock_embed, run_extraction
    from memories_spark.search import hybrid_search, release_caches

    rng = random.Random(seed)
    write_lock = threading.Lock()
    added_ids: list[int] = []

    def op_search(i: int, qidx: int = 0) -> None:
        # qidx was pre-drawn in the single-threaded plan loop below —
        # worker threads never touch the RNG, so query choice is
        # deterministic regardless of thread interleaving
        q = SAMPLE_QUERIES[qidx]
        df = hybrid_search(engine, q, k=k, auto_intent=False, now=now,
                           ann=indexed, lexical=indexed)
        df.collect()
        # serving discipline: free this call's cached blocks so a
        # long run's executor storage stays FLAT (gated in tests)
        release_caches(df)

    def op_add(i: int, qidx: int = 0) -> None:
        text = f"{SAMPLE_TEXTS[i % len(SAMPLE_TEXTS)]} load {i}"
        with write_lock:
            ids = engine.add(
                [{"text": text, "source": f"load/{i % 4}",
                  "embedding": mock_embed(text)}],
                now,
            )
            added_ids.extend(ids)

    def op_delete(i: int, qidx: int = 0) -> None:
        with write_lock:
            victim = added_ids.pop() if added_ids else 1_000_000_000 + i
            engine.delete([victim])

    def op_extract(i: int, qidx: int = 0) -> None:
        with write_lock:
            run_extraction(engine, _EXTRACT_TRANSCRIPT, MockProvider(),
                           f"load/extract{i % 4}", now)

    kinds = {"search": op_search, "add": op_add, "delete": op_delete,
             "extract": op_extract}

    def _draw(name: str) -> tuple[str, int]:
        # ALL RNG draws happen here, in this single-threaded loop
        return (name, rng.randrange(len(SAMPLE_QUERIES)) if name == "search" else 0)

    if scenario in ("search", "burst"):
        plan = [_draw("search") for _ in range(ops)]
    elif scenario in ("add", "extract"):
        plan = [_draw(scenario) for _ in range(ops)]
    elif scenario == "mixed":
        bag = [name for name, w in MIXED_WEIGHTS for _ in range(w)]
        plan = [_draw(bag[rng.randrange(len(bag))]) for _ in range(ops)]
    else:
        raise ValueError(f"unknown scenario: {scenario}")

    results: list[OpResult] = []
    res_lock = threading.Lock()

    def run_one(idx_op):
        idx, (op, qidx) = idx_op
        t0 = time.perf_counter()
        try:
            kinds[op](idx, qidx)
            r = OpResult(op, (time.perf_counter() - t0) * 1000.0, True)
        except Exception as e:  # keep the run going; errors land in the report
            # Full diagnosability: a failed op must NAME itself in the
            # report — operation kind, op index, the exact query text
            # (search ops), and the complete traceback. The round-5
            # loadtest failures were undiagnosable post-hoc precisely
            # because only `type: message` survived into the report
            # and the assertion messages showed nothing at all.
            r = OpResult(op, (time.perf_counter() - t0) * 1000.0, False, {
                "op": op,
                "index": idx,
                "query": SAMPLE_QUERIES[qidx] if op == "search" else None,
                "error": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc(),
            })
        with res_lock:
            results.append(r)

    t_start = time.perf_counter()
    with ThreadPoolExecutor(concurrency) as ex:
        list(ex.map(run_one, enumerate(plan)))
    total_sec = time.perf_counter() - t_start

    per_op: dict[str, dict] = {}
    for op in sorted({r.op for r in results}):
        lats = sorted(r.latency_ms for r in results if r.op == op and r.ok)
        per_op[op] = {
            "count": sum(1 for r in results if r.op == op),
            "errors": sum(1 for r in results if r.op == op and not r.ok),
            "p50_ms": round(_percentile(lats, 0.50), 1),
            "p95_ms": round(_percentile(lats, 0.95), 1),
            "p99_ms": round(_percentile(lats, 0.99), 1),
            "max_ms": round(max(lats), 1) if lats else 0.0,
        }
    return {
        "scenario": scenario,
        "concurrency": concurrency,
        "ops": len(results),
        "total_sec": round(total_sec, 2),
        "ops_per_sec": round(len(results) / total_sec, 2) if total_sec else 0.0,
        "operations": per_op,
        "errors": [r.error for r in results if not r.ok],
    }
