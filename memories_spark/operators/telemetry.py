"""Active-search hook telemetry summarizer (reference 5.4.0).

Twin of the reference's privacy-safe monitoring CLI
(/root/reference/scripts/active_search_metrics.py:1-185): hooks emit
JSONL events — ``prompt_evaluated`` rows flagged
``active_search_required`` and ``tool_call`` rows — and the
summarizer reports, per client, how many required prompts were
FOLLOWED by a ``memory_search`` call (the follow-up rate), how many
were passive-risk (no follow-up), and the scoped-search quality split
(``exact_project`` vs ``broad_or_unscoped``).

The load-bearing semantics is the 5.4 over-crediting fix (reference
CHANGELOG.md 5.4.0 Fixed: "matching each memory search to at most one
prompt"): memory_search calls are processed in timestamp order and
each CONSUMES the latest still-unmatched required prompt of the same
session within the follow-up window — a stack-with-TTL discipline,
not a per-prompt "any search within 300 s" exists-join (which
over-credits whenever one search follows several prompts).

Spark shape: the greedy consumption is sequential WITHIN a session
but sessions are independent, so the matcher is an Arrow-batched
``applyInPandas`` over ``groupBy(session_id)`` — a billion sessions
fan out across executors; per-session event lists are
conversation-sized. Everything around it (memory-search filtering,
quality counters, per-client rollups) is plain JVM-side DataFrame
algebra.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference scripts/active_search_metrics.py:64-67 — a tool event is
#: a memory search when the name IS memory_search or carries an MCP
#: prefix (``mcp__memories__memory_search``)
def memory_search_filter(tool_name: F.Column) -> F.Column:
    return (tool_name == "memory_search") | tool_name.endswith(
        "__memory_search"
    )


_MATCH_SCHEMA = "client string, matched boolean"


def _greedy_matcher(window_seconds: float):
    """Per-session greedy matcher (reference
    active_search_metrics.py:108-137): iterate memory-search calls in
    ts order; each matches (and consumes) the LATEST unmatched
    required prompt with ``0 <= tool_ts - prompt_ts <= window``.
    Emits one row per required prompt with its matched flag."""

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        prompts = (
            pdf[pdf["kind"] == 0]
            .sort_values("ts", kind="stable")
            .reset_index(drop=True)
        )
        if prompts.empty:
            return pd.DataFrame({"client": [], "matched": []}).astype(
                {"client": str, "matched": bool}
            )
        tools = pdf[pdf["kind"] == 1].sort_values("ts", kind="stable")
        n = len(prompts)
        matched = np.zeros(n, dtype=bool)
        pts = prompts["ts"].to_numpy()  # sorted datetime64
        window = np.timedelta64(int(window_seconds * 1_000_000), "us")
        # prompts with 0 <= t - p <= window form a contiguous ts range;
        # each tool consumes the LATEST unmatched one (both boundaries
        # inclusive, matching the reference's BETWEEN, :130-131). A
        # plain backward scan is O(prompts) per tool once a long run of
        # consumed slots builds up — quadratic on a single hot session
        # — so `left` is a path-compressed "next unmatched slot at or
        # left of i" pointer forest: amortized near-constant per tool,
        # keeping one 10^5-10^6-event session linear. Semantics are
        # IDENTICAL to the scan (the property suite pins it against
        # the reference's pure-Python greedy).
        left = np.arange(n, dtype=np.int64)  # left[i] == i: unmatched
        invalid = pd.isna(pts)
        for i in np.flatnonzero(invalid):
            left[i] = i - 1  # NaT prompts never match (:118-120)

        def find(i: int) -> int:
            root = i
            while root >= 0 and left[root] != root:
                root = left[root]
            while i >= 0 and left[i] != i and left[i] != root:
                left[i], i = root, left[i]
            return root

        for t in tools["ts"].to_numpy():
            if np.isnat(t):
                continue  # unparseable tool ts never matches (:118-120)
            lo = int(np.searchsorted(pts, t - window, side="left"))
            hi = int(np.searchsorted(pts, t, side="right"))
            if hi <= lo:
                continue
            j = find(hi - 1)
            if j >= lo:
                matched[j] = True
                left[j] = j - 1
        return pd.DataFrame(
            {"client": prompts["client"].astype(str), "matched": matched}
        )

    return match


def summarize_active_search(
    prompts: DataFrame,
    tools: DataFrame,
    followup_window_seconds: float = 300.0,
) -> DataFrame:
    """Per-client active-search telemetry summary (reference
    scripts/active_search_metrics.py:70-160).

    ``prompts``: required-prompt events — columns (session_id, client,
    ts); pre-filtered to ``prompt_evaluated`` rows with
    ``active_search_required`` true (:72-77).
    ``tools``: tool-call events — columns (session_id, client, ts,
    tool_name, source_prefix_quality).

    Returns one row per client plus an ``(all)`` total row:
    (client, required_prompts, required_with_search,
    passive_risk_prompts, memory_search_calls, exact_project_searches,
    broad_or_unscoped_searches, followup_rate_fp) — the rate is
    fixed-point micro-units of matched/required (1_000_000 when a
    client has no required prompts, the reference's vacuous 1.0,
    :141).

    Per-group size contract: ``applyInPandas`` materializes ONE
    session per Arrow batch, so executor memory bounds the largest
    single session, never the corpus — a 10^6-event session is a
    ~30 MB batch, and the matcher itself is amortized-linear in the
    session's events (soak-tested at 10^5 events in one session,
    tests/test_telemetry.py)."""
    msearch = tools.filter(memory_search_filter(F.col("tool_name")))

    # tool-side counters are plain rollups — every memory_search
    # counts, matched or not (:85-99)
    tool_counts = msearch.groupBy("client").agg(
        F.count("*").alias("memory_search_calls"),
        F.sum(
            (F.col("source_prefix_quality") == "exact_project").cast("long")
        ).alias("exact_project_searches"),
        F.sum(
            (F.col("source_prefix_quality") == "broad_or_unscoped").cast(
                "long"
            )
        ).alias("broad_or_unscoped_searches"),
    )

    # the consumption matcher: sessions are independent, greedy within
    events = prompts.select(
        "session_id", "client", "ts", F.lit(0).alias("kind")
    ).unionByName(
        msearch.select("session_id", "client", "ts", F.lit(1).alias("kind"))
    )
    per_prompt = events.groupBy("session_id").applyInPandas(
        _greedy_matcher(followup_window_seconds), _MATCH_SCHEMA
    )
    prompt_counts = per_prompt.groupBy("client").agg(
        F.count("*").alias("required_prompts"),
        F.sum(F.col("matched").cast("long")).alias("required_with_search"),
    )

    per_client = (
        prompt_counts.join(tool_counts, "client", "full_outer")
        .na.fill(0)
        .withColumn(
            "passive_risk_prompts",
            F.col("required_prompts") - F.col("required_with_search"),
        )
    )
    total = per_client.groupBy(F.lit("(all)").alias("client")).agg(
        *[
            F.sum(c).alias(c)
            for c in (
                "required_prompts",
                "required_with_search",
                "memory_search_calls",
                "exact_project_searches",
                "broad_or_unscoped_searches",
                "passive_risk_prompts",
            )
        ]
    )
    rate = F.when(
        F.col("required_prompts") == 0, F.lit(1_000_000).cast("long")
    ).otherwise(
        F.floor(
            F.col("required_with_search") * F.lit(1_000_000)
            / F.col("required_prompts")
        ).cast("long")
    )
    return (
        per_client.unionByName(total)
        .select(
            "client",
            "required_prompts",
            "required_with_search",
            "passive_risk_prompts",
            "memory_search_calls",
            "exact_project_searches",
            "broad_or_unscoped_searches",
            rate.alias("followup_rate_fp"),
        )
        .orderBy("client")
    )
