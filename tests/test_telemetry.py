"""Active-search telemetry summarizer (reference
scripts/active_search_metrics.py) — consumption-matching semantics."""

from __future__ import annotations

from datetime import datetime

from memories_spark.operators.telemetry import summarize_active_search


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark, prompts, tools):
    pdf = spark.createDataFrame(
        [(sid, c, _ts(t)) for sid, c, t in prompts],
        "session_id long, client string, ts timestamp",
    )
    tdf = spark.createDataFrame(
        [(sid, c, _ts(t), n, q) for sid, c, t, n, q in tools],
        "session_id long, client string, ts timestamp, "
        "tool_name string, source_prefix_quality string",
    )
    return pdf, tdf


def _rows(df):
    return {r.client: r.asDict() for r in df.collect()}


def test_one_search_credits_at_most_one_prompt(spark):
    """The 5.4 over-crediting fix (reference CHANGELOG 5.4.0 Fixed):
    one memory_search after TWO required prompts matches only the
    LATEST prompt — a naive any-search-within-window join would
    credit both."""
    p, t = _frames(
        spark,
        [(1, "codex", "2024-01-01 10:00:00"),
         (1, "codex", "2024-01-01 10:00:30")],
        [(1, "codex", "2024-01-01 10:01:00", "memory_search", "exact_project")],
    )
    out = _rows(summarize_active_search(p, t))
    c = out["codex"]
    assert c["required_prompts"] == 2
    assert c["required_with_search"] == 1
    assert c["passive_risk_prompts"] == 1
    assert out["(all)"]["followup_rate_fp"] == 500_000


def test_two_searches_drain_the_prompt_stack(spark):
    """Latest-first consumption (metrics.py:108-137): T1 takes the
    newest prompt, T2 then reaches back to the older one — both
    prompts end up matched."""
    p, t = _frames(
        spark,
        [(1, "codex", "2024-01-01 10:00:00"),
         (1, "codex", "2024-01-01 10:00:10")],
        [(1, "codex", "2024-01-01 10:00:11", "memory_search", ""),
         (1, "codex", "2024-01-01 10:00:12", "memory_search", "")],
    )
    out = _rows(summarize_active_search(p, t))
    assert out["codex"]["required_with_search"] == 2
    assert out["codex"]["passive_risk_prompts"] == 0


def test_window_session_and_direction_boundaries(spark):
    """A search matches only 0 <= delta <= window, only within its own
    session: a pre-prompt search, an out-of-window search, and a
    cross-session search all leave the prompt passive-risk."""
    p, t = _frames(
        spark,
        [(1, "codex", "2024-01-01 10:00:00")],
        [
            (1, "codex", "2024-01-01 09:59:59", "memory_search", ""),  # before
            (1, "codex", "2024-01-01 10:05:01", "memory_search", ""),  # late
            (2, "codex", "2024-01-01 10:00:05", "memory_search", ""),  # other session
        ],
    )
    out = _rows(summarize_active_search(p, t, followup_window_seconds=300))
    assert out["codex"]["required_with_search"] == 0
    assert out["codex"]["passive_risk_prompts"] == 1
    # exact boundary delta == window DOES match (BETWEEN inclusive)
    p2, t2 = _frames(
        spark,
        [(1, "codex", "2024-01-01 10:00:00")],
        [(1, "codex", "2024-01-01 10:05:00", "memory_search", "")],
    )
    out2 = _rows(summarize_active_search(p2, t2, followup_window_seconds=300))
    assert out2["codex"]["required_with_search"] == 1


def test_memory_search_name_predicate(spark):
    """Only memory_search and *__memory_search count (metrics.py:64-67):
    memory_get and unrelated tools neither match prompts nor enter the
    call counters."""
    p, t = _frames(
        spark,
        [(1, "codex", "2024-01-01 10:00:00")],
        [
            (1, "codex", "2024-01-01 10:00:01", "memory_get", "exact_project"),
            (1, "codex", "2024-01-01 10:00:02", "other_tool", "exact_project"),
            (1, "codex", "2024-01-01 10:00:03",
             "mcp__memories__memory_search", "broad_or_unscoped"),
        ],
    )
    out = _rows(summarize_active_search(p, t))
    c = out["codex"]
    assert c["memory_search_calls"] == 1
    assert c["exact_project_searches"] == 0
    assert c["broad_or_unscoped_searches"] == 1
    assert c["required_with_search"] == 1  # the MCP spelling matched


def test_total_row_and_vacuous_rate(spark):
    """(all) sums every client; a client with searches but zero
    required prompts gets the reference's vacuous rate 1.0
    (metrics.py:141) in fixed point."""
    p, t = _frames(
        spark,
        [(1, "codex", "2024-01-01 10:00:00")],
        [
            (1, "codex", "2024-01-01 10:00:01", "memory_search", "exact_project"),
            (2, "opencode", "2024-01-01 10:00:02", "memory_search", ""),
        ],
    )
    out = _rows(summarize_active_search(p, t))
    assert out["opencode"]["required_prompts"] == 0
    assert out["opencode"]["followup_rate_fp"] == 1_000_000
    assert out["(all)"]["required_prompts"] == 1
    assert out["(all)"]["memory_search_calls"] == 2
    assert out["(all)"]["followup_rate_fp"] == 1_000_000


# --- property: the vectorized matcher == the reference algorithm -------


def _reference_match(prompt_ts, tool_ts, window):
    """Straight port of active_search_metrics.py:108-137: tools in ts
    order each consume the latest unmatched prompt within the window."""
    records = [{"ts": p, "matched": False} for p in sorted(prompt_ts)]
    for t in sorted(tool_ts):
        cands = [
            (r["ts"], i)
            for i, r in enumerate(records)
            if not r["matched"] and 0 <= t - r["ts"] <= window
        ]
        if cands:
            _, idx = max(cands, key=lambda c: c[0])
            records[idx]["matched"] = True
    return sum(r["matched"] for r in records)


def test_matcher_matches_reference_on_random_sessions():
    """The binary-search + reverse-scan matcher must agree with the
    reference's O(T*P) greedy on randomized single-session event sets
    (distinct prompt timestamps, the documented determinism domain)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from memories_spark.operators.telemetry import _greedy_matcher

    @settings(max_examples=200, deadline=None)
    @given(
        prompts=st.lists(
            st.integers(min_value=0, max_value=3000), min_size=0,
            max_size=25, unique=True,
        ),
        tools=st.lists(
            st.integers(min_value=0, max_value=3000), min_size=0,
            max_size=25,
        ),
        window=st.integers(min_value=0, max_value=1500),
    )
    def check(prompts, tools, window):
        base = pd.Timestamp("2024-01-01")
        rows = [
            {"client": "c", "ts": base + pd.Timedelta(seconds=p), "kind": 0}
            for p in prompts
        ] + [
            {"client": "c", "ts": base + pd.Timedelta(seconds=t), "kind": 1}
            for t in tools
        ]
        pdf = pd.DataFrame(rows, columns=["client", "ts", "kind"])
        out = _greedy_matcher(float(window))(pdf)
        got = int(out["matched"].sum())
        want = _reference_match(prompts, tools, window)
        assert got == want, (prompts, tools, window, got, want)
        assert len(out) == len(prompts)

    check()


def test_skewed_session_soak_100k_events(spark):
    """Round-8 soak: ONE pathological session with 10^5 events — 50k
    required prompts packed inside a single follow-up window, then
    50k searches each forced to consume through the growing run of
    already-matched prompts. Pins two contracts: (a) the per-group
    size contract (one session = one Arrow batch; 10^5 events stream
    through applyInPandas within the suite's memory budget), and
    (b) the matcher's amortized-linear complexity (the pre-round-8
    backward scan is O(n^2) on this layout — ~1.25e9 steps — and
    would time the suite out; the pointer-forest version finishes in
    seconds). Expected result: every prompt matched, alternating
    window arithmetic intact."""
    import time
    from datetime import timedelta

    n = 50_000
    base = _ts("2024-01-01 00:00:00")
    # all prompts within 250s < window=300s of every tool
    prompts = [(1, "codex", base + timedelta(microseconds=5 * i))
               for i in range(n)]
    tools = [
        (1, "codex", base + timedelta(seconds=250, microseconds=5 * i),
         "memory_search", "exact_project")
        for i in range(n)
    ]
    pdf = spark.createDataFrame(
        prompts, "session_id long, client string, ts timestamp")
    tdf = spark.createDataFrame(
        tools,
        "session_id long, client string, ts timestamp, "
        "tool_name string, source_prefix_quality string",
    )
    t0 = time.perf_counter()
    out = _rows(summarize_active_search(pdf, tdf))
    elapsed = time.perf_counter() - t0
    c = out["codex"]
    assert c["required_prompts"] == n
    assert c["required_with_search"] == n
    assert c["passive_risk_prompts"] == 0
    assert c["memory_search_calls"] == n
    assert c["followup_rate_fp"] == 1_000_000
    assert out["(all)"]["required_prompts"] == n
    # generous wall bound: quadratic would be minutes, linear is seconds
    assert elapsed < 120, elapsed
