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
import inspect
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

#: Per-source-prefix extraction profile knobs with these defaults
#: (reference extraction_profiles.py:7-19 DEFAULTS). ``mode``
#: ("standard"/"aggressive") is prompt-side in the reference — it
#: reaches the provider so a profile can select the aggressive
#: prompt; ``single_call`` fuses extract + AUDN into ONE provider
#: call with degraded semantics (reference llm_extract.py:463-533,
#: dispatch :863-875).
PROFILE_DEFAULTS = {
    "mode": "standard",
    "max_facts": MAX_FACTS,
    "max_fact_chars": MAX_FACT_CHARS,
    "sim_noop": SIM_NOOP,
    "sim_update": SIM_UPDATE,
    "single_call": False,
    "enabled": True,
}


def _stage_usage(inp: str, out_texts: list[str]) -> dict:
    """Deterministic whitespace-token usage estimate for one provider
    stage (the reference reports provider-metered counts,
    llm_extract.py:449; under a deterministic provider the estimate
    keeps the same stage-keyed accounting shape testable)."""
    return {
        "input": len(inp.split()),
        "output": sum(len(t.split()) for t in out_texts),
    }


def resolve_profile(profiles: list[dict] | None, source: str) -> dict:
    """Longest-prefix cascade resolution (reference
    extraction_profiles.py:68-113): DEFAULTS overlaid by every
    matching profile from least- to most-specific prefix, so the
    most-specific explicitly-set knob wins. Profiles are a tiny
    driver-side config list and ``source`` is one string — pure
    scalar work, no Spark job."""
    resolved = dict(PROFILE_DEFAULTS)
    matches = sorted(
        (p for p in (profiles or []) if source.startswith(p["source_prefix"])),
        key=lambda p: len(p["source_prefix"]),
    )
    for p in matches:
        for key, val in p.items():
            if key != "source_prefix" and val is not None:
                resolved[key] = val
    return resolved


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
    """The LLM boundary (reference llm_provider.py:1-428).

    ``bands`` carries the resolved profile's (sim_noop, sim_update)
    AUDN thresholds — the reference passes the profile into the
    prompt (llm_extract.py:820-860); a deterministic provider applies
    the bands directly. ``mode`` is the profile's prompt selector
    ("standard"/"aggressive", reference extraction_profiles.py:8 +
    llm_extract.py:853-855). ``extract_and_decide`` is the optional
    single-call fusion (reference extract_and_decide_single_call,
    llm_extract.py:494-533): one call returning fused fact+action
    dicts, ADD/NOOP only."""

    def extract_facts(self, transcript: str, mode: str = "standard") -> list[dict]: ...

    def decide(
        self, fact: dict, similar: list[dict], bands: tuple[float, float] | None = None
    ) -> dict: ...

    def extract_and_decide(
        self, transcript: str, max_facts: int = MAX_FACTS, mode: str = "standard"
    ) -> list[dict]: ...


@dataclass
class MockProvider:
    """Rule-based AUDN provider.

    Facts are lines starting with ``FACT:``; directives ``DELETE:``
    and ``CONFLICT:`` drive those actions; otherwise similarity bands
    decide (>=0.95 NOOP, >=0.80 UPDATE, else ADD) — the degraded
    non-AUDN novelty path of the reference (llm_extract.py:353-461).
    """

    calls: list = field(default_factory=list)
    #: profile ``mode`` values observed per extract call (pins that the
    #: resolved profile's mode reaches the provider)
    modes: list = field(default_factory=list)

    def extract_facts(self, transcript: str, mode: str = "standard") -> list[dict]:
        self.modes.append(mode)
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

    def decide(
        self, fact: dict, similar: list[dict], bands: tuple[float, float] | None = None
    ) -> dict:
        self.calls.append((fact["text"], len(similar)))
        sim_noop, sim_update = bands if bands else (SIM_NOOP, SIM_UPDATE)
        if fact["directive"] == "DELETE":
            target = similar[0]["id"] if similar else None
            return {"action": "DELETE", "target_id": target}
        if fact["directive"] == "CONFLICT":
            target = similar[0]["id"] if similar else None
            return {"action": "CONFLICT", "target_id": target}
        top = similar[0]["sim"] if similar else 0.0
        if top >= sim_noop:
            return {"action": "NOOP", "target_id": similar[0]["id"]}
        if top >= sim_update:
            return {"action": "UPDATE", "target_id": similar[0]["id"]}
        return {"action": "ADD", "target_id": None}

    def extract_and_decide(
        self, transcript: str, max_facts: int = MAX_FACTS, mode: str = "standard"
    ) -> list[dict]:
        """Single-call fusion (reference extract_and_decide_single_call,
        llm_extract.py:494-533): ONE provider call, no memory context —
        so only ADD and NOOP are possible, and a directive that needs
        memory context (DELETE:/CONFLICT:) is DEMOTED to ADD exactly
        like the reference demotes UPDATE/DELETE/CONFLICT actions the
        model returns anyway (:526-528). A ``NOOP:`` directive models
        the 'generic knowledge' skip."""
        self.modes.append(mode)
        self.calls.append(("<single_call>", 0))
        actions = []
        for line in transcript.splitlines():
            line = line.strip()
            if not line.startswith(("FACT:", "DELETE:", "CONFLICT:", "NOOP:")):
                continue
            kind, _, body = line.partition(":")
            body = body.strip()[:MAX_FACT_CHARS]
            category = "detail"
            if "|" in body:
                body, _, cat = body.rpartition("|")
                body, cat = body.strip(), cat.strip()
                category = cat if cat in CATEGORIES else "detail"
            actions.append(
                {
                    "action": "NOOP" if kind == "NOOP" else "ADD",
                    "text": body,
                    "category": category,
                }
            )
        return actions[:max_facts]


def _similar_topk(engine: MemoriesEngine, facts: list[dict], k: int = 5) -> dict[int, list[dict]]:
    """One batched top-k similarity join: every fact vs the corpus.

    The reference runs a full hybrid search per fact
    (llm_extract.py:376-386) — here all facts broadcast against one
    corpus scan.
    """
    mem = engine.table("memories").filter(
        ~F.coalesce(F.col("archived"), F.lit(False)) & F.col("embedding").isNotNull()
    )
    # emptiness probe via first() (stops at the first row), not a full
    # count — this runs on every extraction call
    if not facts or mem.select("id").first() is None:
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
    profiles: list[dict] | None = None,
    debug: bool = False,
) -> dict:
    """Execute the AUDN pipeline (reference run_extraction,
    llm_extract.py:820-1053; action rules :534-693).

    Protection rules preserved: DELETE never touches pinned or
    archived rows; UPDATE archives the old row, clears its
    ``is_latest`` and links new→old with ``supersedes``; CONFLICT
    adds the new fact flagged ``conflicts_with`` keeping both.

    The source's longest-prefix extraction profile (reference
    llm_extract.py:820-860 + extraction_profiles.py:68-113) sets the
    fact caps, the AUDN similarity bands, the prompt ``mode`` (passed
    through to the provider, reference extraction_profiles.py:8) and
    the ``single_call`` dispatch: when set, extract + AUDN fuse into
    ONE provider call with DEGRADED semantics — no memory context, so
    only ADD/NOOP actions, no similar-memory lookup, no auto-linking
    (reference llm_extract.py:463-533, dispatch :863-875; its
    single-call result pins links_created=[]). Stage-keyed token
    estimates land in ``summary["tokens"]`` (``extract``/``audn`` or
    ``single_call``). ``debug=True`` adds the reference's per-stage
    trace (llm_extract.py:994-1046): extracted facts, per-decision
    similar memories + resulting ids, and an execution summary.

    Write path is BATCHED — O(1) write jobs per extraction, never
    O(facts): the protection lookup reads only the ≤max_facts DELETE/
    UPDATE target rows (the reference keeps its whole corpus in
    memory so its per-fact loop is free, llm_extract.py:534-693; a
    full pinned/archived corpus collect here would ship millions of
    ids to the driver at scale), then ONE ``add`` appends every new
    row, ONE ``set_flags`` archives every superseded row, ONE
    ``delete`` drops every DELETE target, and ONE ``add_links``
    appends every edge.
    """
    prof = resolve_profile(profiles, source)
    if not prof.get("enabled", True):
        return {"extracted": 0, "added": 0, "updated": 0, "deleted": 0,
                "noop": 0, "conflict": 0, "blocked": 0, "decisions": [],
                "new_ids": [], "tokens": {}, "disabled": True}
    max_chars = int(prof["max_fact_chars"])
    mode = str(prof.get("mode", "standard"))
    bands = (float(prof["sim_noop"]), float(prof["sim_update"]))

    if prof.get("single_call"):
        # ONE fused provider call; no memory context -> ADD/NOOP only
        # (anything else the provider returns is demoted to ADD,
        # reference llm_extract.py:526-528), no similar lookup, no
        # auto-linking
        fused = provider.extract_and_decide(
            transcript, max_facts=int(prof["max_facts"]), mode=mode
        )[: int(prof["max_facts"])]
        facts = [
            {"text": a.get("text", "")[:max_chars],
             "category": a.get("category") if a.get("category") in CATEGORIES
             else "detail",
             "directive": "FACT"}
            for a in fused
        ]
        decisions = [
            {"action": a.get("action") if a.get("action") in ("ADD", "NOOP")
             else "ADD", "target_id": None}
            for a in fused
        ]
        similar = {i: [] for i in range(len(facts))}
        tokens = {
            "single_call": _stage_usage(transcript, [f["text"] for f in facts])
        }
    else:
        # signature inspection, not try/except TypeError: a TypeError
        # raised INSIDE a mode-aware provider must not trigger a
        # second (billed, side-effecting) call
        try:
            sig = inspect.signature(provider.extract_facts)
            accepts_mode = "mode" in sig.parameters or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values()
            )
        except (TypeError, ValueError):  # builtins/C callables: assume new
            accepts_mode = True
        raw_facts = (
            provider.extract_facts(transcript, mode=mode)
            if accepts_mode
            else provider.extract_facts(transcript)
        )
        facts = [
            {**f, "text": f["text"][:max_chars]}
            for f in raw_facts[: int(prof["max_facts"])]
        ]
        similar = _similar_topk(engine, facts)
        decisions = [
            provider.decide(f, similar[i], bands) for i, f in enumerate(facts)
        ]
        tokens = {
            "extract": _stage_usage(transcript, [f["text"] for f in facts]),
            "audn": {
                "input": sum(len(f["text"].split()) for f in facts)
                + sum(len(s) for s in similar.values()),
                "output": len(decisions),
            },
        }
    summary = {"extracted": len(facts), "added": 0, "updated": 0,
               "deleted": 0, "noop": 0, "conflict": 0, "blocked": 0,
               "decisions": decisions, "new_ids": [], "tokens": tokens}
    if dry_run:
        if debug:
            # pre-execution trace: everything is already computed at
            # this point except resulting ids (nothing executes)
            summary["debug_trace"] = {
                "extracted_facts": [
                    {"text": f["text"], "category": f["category"]} for f in facts
                ],
                "audn_decisions": [
                    {"fact_index": i, "action": d["action"],
                     "target_id": d.get("target_id"),
                     "similar_memories": similar[i]}
                    for i, d in enumerate(decisions)
                ],
                "execution_summary": None,  # dry run: nothing executed
            }
        return summary

    # ONE bounded lookup: just the ≤2*max_facts target rows — the
    # pinned/archived protection flags and the UPDATE previous_texts.
    target_ids = sorted(
        {
            int(d["target_id"])
            for d in decisions
            if d["action"] in ("DELETE", "UPDATE") and d.get("target_id") is not None
        }
    )
    tinfo = (
        {
            int(r.id): r
            for r in engine.get(target_ids)
            .select("id", "text", "pinned", "archived")
            .collect()
        }
        if target_ids
        else {}
    )

    def _protected(tid: int) -> bool:
        r = tinfo.get(tid)
        return r is not None and (bool(r.pinned) or bool(r.archived))

    # pass 1: per-fact decisions → batched action sets (driver scalars)
    new_rows: list[dict] = []       # one engine.add for ALL new rows
    new_row_facts: list[int] = []   # fact index per new row (links/ids)
    update_targets: list[int] = []  # one set_flags rewrite
    delete_targets: list[int] = []  # one delete batch
    for i, (fact, dec) in enumerate(zip(facts, decisions)):
        action = dec["action"]
        if action == "NOOP":
            summary["noop"] += 1
        elif action == "DELETE":
            tid = dec.get("target_id")
            if tid is None or _protected(int(tid)):
                summary["blocked"] += 1
            else:
                delete_targets.append(int(tid))
                summary["deleted"] += 1
        elif action == "UPDATE":
            tid = int(dec["target_id"])
            old = tinfo.get(tid)
            new_rows.append(
                {
                    "text": fact["text"],
                    "source": source,
                    "category": fact["category"],
                    "supersedes": tid,
                    "previous_text": old.text if old else None,
                    "embedding": mock_embed(fact["text"]),
                }
            )
            new_row_facts.append(i)
            update_targets.append(tid)
            summary["updated"] += 1
        elif action == "CONFLICT":
            new_rows.append(
                {
                    "text": fact["text"],
                    "source": source,
                    "category": fact["category"],
                    "conflicts_with": dec.get("target_id"),
                    "embedding": mock_embed(fact["text"]),
                }
            )
            new_row_facts.append(i)
            summary["conflict"] += 1
        else:  # ADD
            new_rows.append(
                {
                    "text": fact["text"],
                    "source": source,
                    "category": fact["category"],
                    "embedding": mock_embed(fact["text"]),
                }
            )
            new_row_facts.append(i)
            summary["added"] += 1

    # pass 2: O(1) write jobs — add, flags, delete, links
    new_ids = engine.add(new_rows, now) if new_rows else []
    summary["new_ids"] = new_ids
    pending_links: list[tuple[int, int, str]] = []
    for new_id, fact_i, row in zip(new_ids, new_row_facts, new_rows):
        if row.get("supersedes") is not None:
            pending_links.append((new_id, int(row["supersedes"]), "supersedes"))
        elif row.get("conflicts_with") is None:
            # C8 auto-linking for plain ADDs: up to 3 similar rows
            for s in similar[fact_i][:AUTO_LINK_K]:
                if s["sim"] >= 0.005 and s["id"] != new_id:
                    pending_links.append((new_id, s["id"], "related_to"))
    if update_targets:
        # archive + leave the "latest" set (reference is_latest:false)
        # in ONE partition-pruned rewrite across all touched folders
        engine.set_flags(sorted(set(update_targets)), now, archived=True, is_latest=False)
    if delete_targets:
        engine.delete(sorted(set(delete_targets)), now)
    if pending_links:
        engine.add_links(pending_links, now)

    if debug:
        # per-stage trace (reference llm_extract.py:994-1046): what was
        # extracted, what each decision saw, which ids resulted
        fact_new_id = dict(zip(new_row_facts, new_ids))
        audn_trace = []
        upd_entries, del_ids, added_ids = [], [], []
        for i, (fact, dec) in enumerate(zip(facts, decisions)):
            entry: dict = {
                "fact_index": i,
                "action": dec["action"],
                "similar_memories": similar[i],
            }
            tid = dec.get("target_id")
            if dec["action"] == "NOOP":
                entry["existing_id"] = tid
            elif dec["action"] == "DELETE":
                entry["old_id"] = tid
                if tid is not None and int(tid) in delete_targets:
                    del_ids.append(int(tid))
                else:
                    entry["blocked"] = True
            elif dec["action"] == "UPDATE":
                entry["old_id"] = tid
                entry["new_id"] = fact_new_id.get(i)
                upd_entries.append({"old": tid, "new": fact_new_id.get(i)})
            elif dec["action"] == "CONFLICT":
                entry["new_id"] = fact_new_id.get(i)
                entry["conflicts_with"] = tid
            else:  # ADD
                entry["new_id"] = fact_new_id.get(i)
                if fact_new_id.get(i) is not None:
                    added_ids.append(fact_new_id[i])
            audn_trace.append(entry)
        summary["debug_trace"] = {
            "extracted_facts": [
                {"text": f["text"], "category": f["category"]} for f in facts
            ],
            "audn_decisions": audn_trace,
            "execution_summary": {
                "added": added_ids,
                "updated": upd_entries,
                "deleted": del_ids,
                "noops": summary["noop"],
                "conflicts": summary["conflict"],
            },
        }
    return summary


def consolidate_cluster(
    engine: MemoriesEngine, ids: list[int], merged_text: str, now: str
) -> int | None:
    """C4 LLM cluster merge, deterministic form: callers supply the
    merged text (mock of the LLM merge call, consolidator.py:146-218);
    originals archived with supersedes links via engine.merge."""
    return engine.merge(ids, merged_text, now)
