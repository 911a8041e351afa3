"""LLM extraction pipeline (AUDN) behind a pluggable provider.

Mirrors the reference's extraction job (reference
llm_extract.py:820-1053): transcript → facts[] → per-fact similar
top-k → AUDN decisions (Add / Update / Delete / Noop / Conflict) →
action execution with protection rules → auto-linking maintenance.
The LLM calls live behind ``Provider``; ``MockProvider`` is a
deterministic rule-based stand-in (the reference's own test strategy
— its 1,249-LoC test_llm_extract.py runs on mocked providers), so
every AUDN semantics rule is testable without a network.

Spark shape: fact-vs-corpus similarity is ONE batched top-k join
(all facts at once — the reference re-enters its full hybrid search
per fact, llm_extract.py:376-386); action execution maps to engine
mutations (Delta MERGE batches in production).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import functions as F

from memories_spark.engine import MemoriesEngine
from memories_spark.operators.similarity import topk_cosine

MAX_FACTS = 30        # reference llm_extract.py:292-350 caps
MAX_FACT_CHARS = 500
CATEGORIES = {"decision", "learning", "detail"}
SIM_NOOP = 0.95       # >= : duplicate, NOOP (reference _import_smart bands)
SIM_UPDATE = 0.80     # [0.80, 0.95): same entity, UPDATE
AUTO_LINK_K = 3       # reference C8, llm_extract.py:730-772
EMBED_DIM = 32


def mock_embed(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic hashed bag-of-words embedding (L2-normalized).

    Stands in for the ONNX MiniLM embedder (reference
    onnx_embedder.py:80-147) so correctness tests are hermetic:
    token → md5 bucket, count, sign from a second hash bit.
    """
    vec = [0.0] * dim
    for tok in text.lower().split():
        h = hashlib.md5(tok.encode()).digest()
        bucket = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[bucket] += sign
    norm = math.sqrt(sum(x * x for x in vec))
    return [x / norm for x in vec] if norm > 0 else vec


class Provider(Protocol):
    """The LLM boundary (reference llm_provider.py:1-428)."""

    def extract_facts(self, transcript: str) -> list[dict]: ...

    def decide(self, fact: dict, similar: list[dict]) -> dict: ...


@dataclass
class MockProvider:
    """Rule-based AUDN provider.

    Facts are lines starting with ``FACT:``; directives ``DELETE:``
    and ``CONFLICT:`` drive those actions; otherwise similarity bands
    decide (>=0.95 NOOP, >=0.80 UPDATE, else ADD) — the degraded
    non-AUDN novelty path of the reference (llm_extract.py:353-461).
    """

    calls: list = field(default_factory=list)

    def extract_facts(self, transcript: str) -> list[dict]:
        facts = []
        for line in transcript.splitlines():
            line = line.strip()
            if not line.startswith(("FACT:", "DELETE:", "CONFLICT:")):
                continue
            kind, _, body = line.partition(":")
            body = body.strip()[:MAX_FACT_CHARS]
            category = "detail"
            if "|" in body:
                body, _, cat = body.rpartition("|")
                body, cat = body.strip(), cat.strip()
                category = cat if cat in CATEGORIES else "detail"
            facts.append({"text": body, "category": category, "directive": kind})
        return facts[:MAX_FACTS]

    def decide(self, fact: dict, similar: list[dict]) -> dict:
        self.calls.append((fact["text"], len(similar)))
        if fact["directive"] == "DELETE":
            target = similar[0]["id"] if similar else None
            return {"action": "DELETE", "target_id": target}
        if fact["directive"] == "CONFLICT":
            target = similar[0]["id"] if similar else None
            return {"action": "CONFLICT", "target_id": target}
        top = similar[0]["sim"] if similar else 0.0
        if top >= SIM_NOOP:
            return {"action": "NOOP", "target_id": similar[0]["id"]}
        if top >= SIM_UPDATE:
            return {"action": "UPDATE", "target_id": similar[0]["id"]}
        return {"action": "ADD", "target_id": None}


def _similar_topk(engine: MemoriesEngine, facts: list[dict], k: int = 5) -> dict[int, list[dict]]:
    """One batched top-k similarity join: every fact vs the corpus.

    The reference runs a full hybrid search per fact
    (llm_extract.py:376-386) — here all facts broadcast against one
    corpus scan.
    """
    mem = engine.table("memories").filter(
        ~F.coalesce(F.col("archived"), F.lit(False)) & F.col("embedding").isNotNull()
    )
    if mem.count() == 0 or not facts:
        return {i: [] for i in range(len(facts))}
    queries = engine.spark.createDataFrame(
        [(i, mock_embed(f["text"])) for i, f in enumerate(facts)],
        "query_id long, query_vec array<float>",
    )
    hits = topk_cosine(
        mem.select(F.col("id").alias("vec_id"), F.col("embedding")),
        queries,
        k=k,
        exclude_self=False,
    ).collect()
    out: dict[int, list[dict]] = {i: [] for i in range(len(facts))}
    for r in sorted(hits, key=lambda r: (r.query_id, r.rank)):
        out[int(r.query_id)].append({"id": int(r.vec_id), "sim": float(r.sim)})
    return out


def run_extraction(
    engine: MemoriesEngine,
    transcript: str,
    provider: Provider,
    source: str,
    now: str,
    dry_run: bool = False,
) -> dict:
    """Execute the AUDN pipeline (reference run_extraction,
    llm_extract.py:820-1053; action rules :534-693).

    Protection rules preserved: DELETE never touches pinned or
    archived rows; UPDATE archives the old row, clears its
    ``is_latest`` and links new→old with ``supersedes``; CONFLICT
    adds the new fact flagged ``conflicts_with`` keeping both.
    """
    facts = provider.extract_facts(transcript)
    similar = _similar_topk(engine, facts)
    decisions = [provider.decide(f, similar[i]) for i, f in enumerate(facts)]
    summary = {"extracted": len(facts), "added": 0, "updated": 0,
               "deleted": 0, "noop": 0, "conflict": 0, "blocked": 0,
               "decisions": decisions, "new_ids": []}
    if dry_run:
        return summary

    protected = {
        int(r.id)
        for r in engine.table("memories")
        .filter(F.coalesce(F.col("pinned"), F.lit(False)) | F.coalesce(F.col("archived"), F.lit(False)))
        .select("id")
        .collect()
    }

    # link writes batch into ONE append at the end (the links table is
    # an append-only log; per-edge writes would still be one file per
    # edge, and one batched validation job beats 2 jobs per edge)
    pending_links: list[tuple[int, int, str]] = []
    for i, (fact, dec) in enumerate(zip(facts, decisions)):
        action = dec["action"]
        if action == "NOOP":
            summary["noop"] += 1
        elif action == "DELETE":
            tid = dec.get("target_id")
            if tid is None or tid in protected:
                summary["blocked"] += 1
            else:
                engine.delete([tid])
                summary["deleted"] += 1
        elif action == "UPDATE":
            tid = dec["target_id"]
            old = engine.get([tid]).collect()
            prev_text = old[0].text if old else None
            [new_id] = engine.add(
                [
                    {
                        "text": fact["text"],
                        "source": source,
                        "category": fact["category"],
                        "supersedes": tid,
                        "previous_text": prev_text,
                        "embedding": mock_embed(fact["text"]),
                    }
                ],
                now,
            )
            # archive + leave the "latest" set (reference is_latest:false)
            # in ONE partition-pruned rewrite of the old row's folder
            engine.set_flags([tid], now, archived=True, is_latest=False)
            pending_links.append((new_id, tid, "supersedes"))
            summary["updated"] += 1
            summary["new_ids"].append(new_id)
        elif action == "CONFLICT":
            [new_id] = engine.add(
                [
                    {
                        "text": fact["text"],
                        "source": source,
                        "category": fact["category"],
                        "conflicts_with": dec.get("target_id"),
                        "embedding": mock_embed(fact["text"]),
                    }
                ],
                now,
            )
            summary["conflict"] += 1
            summary["new_ids"].append(new_id)
        else:  # ADD
            [new_id] = engine.add(
                [
                    {
                        "text": fact["text"],
                        "source": source,
                        "category": fact["category"],
                        "embedding": mock_embed(fact["text"]),
                    }
                ],
                now,
            )
            summary["added"] += 1
            summary["new_ids"].append(new_id)
            # C8 auto-linking: link to up to 3 similar existing rows
            for s in similar[i][:AUTO_LINK_K]:
                if s["sim"] >= 0.005 and s["id"] != new_id:
                    pending_links.append((new_id, s["id"], "related_to"))
    if pending_links:
        engine.add_links(pending_links, now)
    return summary


def consolidate_cluster(
    engine: MemoriesEngine, ids: list[int], merged_text: str, now: str
) -> int | None:
    """C4 LLM cluster merge, deterministic form: callers supply the
    merged text (mock of the LLM merge call, consolidator.py:146-218);
    originals archived with supersedes links via engine.merge."""
    return engine.merge(ids, merged_text, now)
