"""LongMemEval-style end-to-end retrieval quality over the FULL
hybrid stack: seeded session corpus -> chunked memories -> real
``hybrid_search`` (BM25 + vector + RRF fusion) -> session-level
dedupe -> R@5 with a pinned floor.

Twin of the reference's primary published quality harness
(/root/reference/eval/longmemeval.py:59-95 seeding + :255-307
``compute_recall_at_k``): sessions are chunked into multiple
memories under ``eval/lme/s{idx}/c{chunk}``; retrieval ranks chunks;
unique sessions are collected in rank order (first appearance); R@5
asks whether the gold session is among the top-5 unique sessions.
The registered query ``longmemeval_recall_at5`` replays the metric
itself against a DuckDB oracle; this test exercises the serving path
the metric models.
"""

from __future__ import annotations

import re

import pytest

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.search import hybrid_search

NOW = "2024-06-01 12:00:00"
_SESSION_RE = re.compile(r"/s(\d+)/c\d+$")

# 10 sessions, each a multi-turn "conversation" chunked into 2-3
# memories. Each question targets exactly one session (distinct
# domain vocabulary, as in the reference's single-session categories).
SESSIONS = [
    [
        "user: how should the invoice ledger handle refunds",
        "assistant: refunds post as negative ledger entries, never deletes",
        "user: and partial refunds? assistant: partial refunds split the ledger entry pro rata",
    ],
    [
        "user: what timezone do the cron reports run in",
        "assistant: all cron reports run at midnight saville time",
    ],
    [
        "user: which font did design pick for the terminal",
        "assistant: the terminal uses berkeley mono at thirteen points",
        "user: fallback? assistant: fallback stack is menlo then consolas",
    ],
    [
        "user: remind me of the wifi password policy",
        "assistant: guest wifi rotates passphrases every friday at noon",
    ],
    [
        "user: how many replicas does the ledger database keep",
        "assistant: three replicas across two availability zones",
    ],
    [
        "user: what was the outcome of the kernel upgrade spike",
        "assistant: the kernel upgrade is blocked on the gpu driver until autumn",
    ],
    [
        "user: where do the mobile crash dumps land",
        "assistant: crash dumps upload to the symbolication bucket hourly",
    ],
    [
        "user: who owns the onboarding checklist now",
        "assistant: the onboarding checklist moved to the people team wiki",
    ],
    [
        "user: what is the freeze window before the conference demo",
        "assistant: code freeze starts two days before the demo, hotfixes only",
    ],
    [
        "user: how long do we retain the chat transcripts",
        "assistant: transcripts retain for ninety days then purge automatically",
    ],
]

QUESTIONS = [
    (0, "how does the invoice ledger handle refunds"),
    (1, "what timezone do cron reports run in"),
    (2, "which font does the terminal use"),
    (3, "what is the wifi passphrase policy"),
    (4, "how many replicas does the ledger database keep"),
    (5, "what happened with the kernel upgrade spike"),
    (6, "where do mobile crash dumps land"),
    (7, "who owns the onboarding checklist"),
    (8, "when does the freeze window start before the demo"),
    (9, "how long are chat transcripts retained"),
]


@pytest.fixture(scope="module")
def lme_engine(spark, tmp_path_factory):
    eng = MemoriesEngine(spark, str(tmp_path_factory.mktemp("lme") / "store"))
    recs = []
    for sidx, turns in enumerate(SESSIONS):
        # chunk on turn boundaries, 2 turns per memory (reference
        # _chunk_session, size-capped turn packing)
        for cidx in range(0, len(turns), 2):
            chunk = "\n\n".join(turns[cidx : cidx + 2])
            recs.append(
                {
                    "text": chunk,
                    "source": f"eval/lme/s{sidx}/c{cidx // 2}",
                    "embedding": mock_embed(chunk),
                }
            )
    eng.add(recs, NOW)
    return eng


def _recall_any_at_5(rows, gold_sidx):
    seen, unique = set(), []
    for r in rows:
        m = _SESSION_RE.search(r.source)
        if not m:
            continue
        s = int(m.group(1))
        if s not in seen:
            seen.add(s)
            unique.append(s)
            if len(unique) >= 5:
                break
    return 1.0 if gold_sidx in unique[:5] else 0.0


def _collect_all(engine, questions):
    """Run the question set as CONCURRENT Spark jobs (one session,
    overlapping scheduling) — same results, ~4x less wall time."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    lock = threading.Lock()

    def run(gq):
        gold, q = gq
        with lock:  # serialize py4j-heavy plan construction
            df = hybrid_search(engine, q, k=10, now=NOW)
        return gold, df.collect()

    with ThreadPoolExecutor(8) as ex:
        return list(ex.map(run, questions))


def test_longmemeval_recall_floor(lme_engine):
    recalls = [
        _recall_any_at_5(rows, gold) for gold, rows in _collect_all(lme_engine, QUESTIONS)
    ]
    mean = sum(recalls) / len(recalls)
    # floor well under the measured value so the pin guards
    # regressions in the hybrid stack, not corpus noise
    assert mean >= 0.8, list(zip([g for g, _ in QUESTIONS], recalls))


def test_longmemeval_top_session_is_gold_for_exact_queries(lme_engine):
    # for a query that is a near-verbatim restatement, the gold
    # session must be the FIRST unique session (rank-1 parity with
    # the reference's single-session-user category)
    hits = 0
    for gold, rows in _collect_all(lme_engine, QUESTIONS[:5]):
        m = _SESSION_RE.search(rows[0].source)
        hits += int(m and int(m.group(1)) == gold)
    assert hits >= 4, hits


def test_chunk_cap_parity_on_long_docs(spark, tmp_path):
    """Docs longer than 960 tokens (32 chunks x 30 tokens) must hit
    the SAME per-doc chunk cap on both engines. Real testdata maxes
    out near 100 tokens, so this builds a synthetic corpus with
    >32-chunk docs and runs the registered query against its own
    DuckDB oracle over that corpus (the latent divergence the
    round-2 review flagged: oracle capped at 32 chunks, Spark side
    unbounded)."""
    import shutil

    from tests.parity import compare
    from memories_spark.plans.registry import QUERIES

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "sfLONG"
    dst.mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", dst / f"{name}.parquet")

    # 40 docs of 1200 tokens each (40 raw chunks -> capped at 32);
    # doc i's tokens repeat a small vocabulary so queries (8-token
    # prefixes) overlap several docs' later chunks too
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = []
    for i in range(40):
        texts.append(" ".join(f"w{(i * 7 + j) % 90}" for j in range(1200)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": texts,
                "lang": ["en"] * 40,
                "source": [f"gen/{i}" for i in range(40)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(dst / "documents.parquet"),
    )

    spec = QUERIES["longmemeval_recall_at5"]
    ok, detail = compare(spec.fn(spark, str(dst)), spec.oracle, str(dst))
    assert ok, detail
