"""Query-intent classifier tests (reference R13).

One case per grammar form, mirroring the reference's own enumeration
(reference tests/test_query_intent.py:9-237) with its fixed anchor:
Wednesday 2026-04-08. Until bounds are end-of-day (23:59:59) because
the engine's temporal filter is inclusive (anchor <= until), matching
the reference's _iso_end convention.
"""

from __future__ import annotations

from datetime import datetime

from memories_spark.functions.intent import apply_intent, classify_intent

REF = datetime(2026, 4, 8, 12, 0)  # Wednesday, reference test anchor


def eod(y, m, d):
    return datetime(y, m, d, 23, 59, 59)


def test_last_week():
    i = classify_intent("what did I work on last week", REF)
    assert i["since"] == datetime(2026, 3, 30)
    assert i["until"] == eod(2026, 4, 5)
    assert i["suppress_graph"]


def test_last_month():
    i = classify_intent("changes from last month", REF)
    assert i["since"] == datetime(2026, 3, 1)
    assert i["until"] == eod(2026, 3, 31)


def test_last_year():
    i = classify_intent("last year's decisions", REF)
    assert i["since"] == datetime(2025, 1, 1)
    assert i["until"] == eod(2025, 12, 31)


def test_yesterday():
    i = classify_intent("what happened yesterday", REF)
    assert i["since"] == datetime(2026, 4, 7)
    assert i["until"] == eod(2026, 4, 7)


def test_n_days_ago():
    i = classify_intent("what was discussed 3 days ago", REF)
    assert i["since"] == datetime(2026, 4, 5)
    assert i["until"] == eod(2026, 4, 5)


def test_n_weeks_ago_pins_whole_week():
    i = classify_intent("decisions two weeks ago", REF)
    assert i["since"] == datetime(2026, 3, 23)
    assert i["until"] == eod(2026, 3, 29)


def test_a_month_ago():
    i = classify_intent("a month ago", REF)
    assert i["since"] == datetime(2026, 3, 9)  # now - 30 days, day-pinned
    assert i["until"] == eod(2026, 3, 9)


def test_a_year_ago():
    i = classify_intent("one year ago", REF)
    assert i["since"] == datetime(2025, 4, 8)  # now - 365 days


def test_couple_days_ago():
    i = classify_intent("couple days ago", REF)
    assert i["since"] == datetime(2026, 4, 6)


def test_past_few_months_open_ended():
    i = classify_intent("what changed in the past few months", REF)
    assert i["since"] == datetime(2026, 1, 8)  # few=3 -> 90 days back
    assert i["until"] is None
    assert i["suppress_graph"]


def test_past_two_weeks():
    i = classify_intent("updates from the past two weeks", REF)
    assert i["since"] == datetime(2026, 3, 25)
    assert i["until"] is None


def test_last_n_days_is_past_form():
    i = classify_intent("errors in the last 5 days", REF)
    assert i["since"] == datetime(2026, 4, 3)
    assert i["until"] is None


def test_in_month_past():
    i = classify_intent("what happened in March", REF)
    assert i["since"] == datetime(2026, 3, 1)
    assert i["until"] == eod(2026, 3, 31)


def test_in_month_future_wraps_to_previous_year():
    i = classify_intent("things from November", REF)
    assert i["since"] == datetime(2025, 11, 1)
    assert i["until"] == eod(2025, 11, 30)


def test_abbreviated_month():
    i = classify_intent("what happened in Mar?", REF)
    assert i["since"] == datetime(2026, 3, 1)
    assert i["until"] == eod(2026, 3, 31)


def test_month_range_pins_year():
    # July-Oct from Apr 2026 -> 2025 (most recent full occurrence)
    i = classify_intent("from July to October changes", REF)
    assert i["since"] == datetime(2025, 7, 1)
    assert i["until"] == eod(2025, 10, 31)
    assert i["suppress_graph"]


def test_month_range_between():
    i = classify_intent("between March and June", REF)
    assert i["since"] == datetime(2025, 3, 1)  # June > April -> 2025
    assert i["until"] == eod(2025, 6, 30)


def test_month_range_wraps_nov_feb():
    i = classify_intent("from November to February", REF)
    assert i["since"] == datetime(2025, 11, 1)  # start year = end year - 1
    assert i["until"] == eod(2026, 2, 28)


def test_month_range_beats_last_month():
    # first matching pattern wins (reference precedence)
    i = classify_intent("from July to October changes last month", REF)
    assert i["since"].month == 7 and i["until"].month == 10


def test_this_week():
    i = classify_intent("what happened this week", REF)
    assert i["since"] == datetime(2026, 4, 6)
    assert i["until"] is None


def test_this_month():
    i = classify_intent("this month's changes", REF)
    assert i["since"] == datetime(2026, 4, 1)
    assert i["until"] is None


def test_this_year():
    i = classify_intent("this year's decisions", REF)
    assert i["since"] == datetime(2026, 1, 1)
    assert i["until"] is None
    assert i["suppress_graph"]


def test_last_thursday():
    # Ref is Wed Apr 8 -> last Thursday = Apr 2
    i = classify_intent("what happened last Thursday", REF)
    assert i["since"] == datetime(2026, 4, 2)
    assert i["until"] == eod(2026, 4, 2)


def test_last_saturday():
    i = classify_intent("meeting notes from last Saturday", REF)
    assert i["since"] == datetime(2026, 4, 4)
    assert i["until"] == eod(2026, 4, 4)


def test_last_wednesday_is_a_week_back():
    # same weekday as 'now' -> strictly past occurrence (7 days back)
    i = classify_intent("demo last wednesday", REF)
    assert i["since"] == datetime(2026, 4, 1)


def test_recency_boost_without_window():
    for q in ("what did I recently add", "show me the latest decisions",
              "most recent architecture notes", "newest configs"):
        i = classify_intent(q, REF)
        assert i["recency_boost"] == 0.2, q
        assert i["since"] is None and not i["suppress_graph"], q


def test_window_wins_over_recency_word():
    # reference early-returns on the window pattern: no boost
    i = classify_intent("latest changes from last week", REF)
    assert i["since"] is not None and i["recency_boost"] == 0.0


def test_today_is_not_a_temporal_form():
    # the reference grammar has no 'today' pattern (query_intent.py:37-58)
    i = classify_intent("what changed today?", REF)
    assert i["since"] is None and not i["suppress_graph"]


def test_no_false_positives():
    for q in (
        "project architecture decisions",
        "what database does OrderService use?",
        "How much time do I dedicate to guitar?",
        "When did I volunteer at the shelter?",
        "What was my last name before I changed it?",
        "How old was I when grandma gave me the necklace?",
    ):
        i = classify_intent(q, REF)
        assert i["since"] is None and i["until"] is None, q
        assert not i["suppress_graph"] and i["recency_boost"] == 0.0, q


def test_apply_intent_caller_wins():
    intent = classify_intent("yesterday", REF)
    merged = apply_intent({"since": datetime(2020, 1, 1), "graph_weight": 0.3}, intent)
    assert merged["since"] == datetime(2020, 1, 1)  # caller value preserved
    assert merged["until"] == eod(2026, 4, 7)  # gap filled
    assert merged["graph_weight"] == 0.3  # caller value preserved


def test_apply_intent_fills_gaps():
    intent = classify_intent("recently", REF)
    merged = apply_intent({"graph_weight": None}, intent)
    assert merged["recency_weight"] == 0.2
    assert merged.get("since") is None
    assert merged.get("graph_weight") is None  # recency never suppresses


def test_apply_intent_suppresses_graph_for_windows():
    intent = classify_intent("what shipped last week", REF)
    merged = apply_intent({"graph_weight": None}, intent)
    assert merged["graph_weight"] == 0.0
