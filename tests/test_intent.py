"""Query-intent classifier tests (reference R13, query_intent.py)."""

from __future__ import annotations

from datetime import datetime

from memories_spark.functions.intent import apply_intent, classify_intent

NOW = datetime(2024, 6, 12, 15, 30)  # a Wednesday


def test_today():
    i = classify_intent("what changed today?", NOW)
    assert i["since"] == datetime(2024, 6, 12)
    assert i["until"] is None and i["suppress_graph"]


def test_yesterday():
    i = classify_intent("what did we decide yesterday", NOW)
    assert i["since"] == datetime(2024, 6, 11)
    assert i["until"] == datetime(2024, 6, 12)


def test_last_week():
    i = classify_intent("meetings last week", NOW)
    assert i["since"] == datetime(2024, 6, 3)
    assert i["until"] == datetime(2024, 6, 10)


def test_this_week_and_month():
    assert classify_intent("plans this week", NOW)["since"] == datetime(2024, 6, 10)
    assert classify_intent("spend this month", NOW)["since"] == datetime(2024, 6, 1)
    lm = classify_intent("incidents last month", NOW)
    assert (lm["since"], lm["until"]) == (datetime(2024, 5, 1), datetime(2024, 6, 1))


def test_n_days_ago_digit_and_word():
    i = classify_intent("deploy 3 days ago", NOW)
    assert i["since"] == datetime(2024, 6, 9) and i["until"] == datetime(2024, 6, 10)
    i2 = classify_intent("what happened two days ago", NOW)
    assert i2["since"] == datetime(2024, 6, 10)


def test_in_month_current_year_vs_previous():
    i = classify_intent("the outage in march", NOW)
    assert (i["since"], i["until"]) == (datetime(2024, 3, 1), datetime(2024, 4, 1))
    # month after 'now' -> previous year
    i2 = classify_intent("the launch in november", NOW)
    assert (i2["since"], i2["until"]) == (datetime(2023, 11, 1), datetime(2023, 12, 1))


def test_december_rollover():
    i = classify_intent("in december", NOW)
    assert (i["since"], i["until"]) == (datetime(2023, 12, 1), datetime(2024, 1, 1))


def test_recency_boost_without_window():
    i = classify_intent("what is the latest api endpoint", NOW)
    assert i["recency_boost"] == 0.2
    assert i["since"] is None and not i["suppress_graph"]


def test_plain_query_no_rewrites():
    i = classify_intent("how does auth work", NOW)
    assert i == {"since": None, "until": None, "suppress_graph": False, "recency_boost": 0.0}


def test_apply_intent_caller_wins():
    intent = classify_intent("yesterday", NOW)
    merged = apply_intent({"since": datetime(2020, 1, 1), "graph_weight": 0.3}, intent)
    assert merged["since"] == datetime(2020, 1, 1)  # caller value preserved
    assert merged["until"] == datetime(2024, 6, 12)  # gap filled
    assert merged["graph_weight"] == 0.3  # caller value preserved


def test_apply_intent_fills_gaps():
    intent = classify_intent("recently", NOW)
    merged = apply_intent({"graph_weight": None}, intent)
    assert merged["recency_weight"] == 0.2
    assert "since" not in merged or merged.get("since") is None
