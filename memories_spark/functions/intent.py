"""Query-intent classification: regex temporal parsing of the query
string into search-parameter rewrites.

Mirrors the reference's classifier (reference query_intent.py:
105-253, 266-305): temporal phrases become ``since``/``until``
bounds, explicit temporal queries suppress graph expansion, vague
recency phrases add a recency boost. Caller-provided parameters
always win (the rewrite only fills gaps). Pure driver-side function
— it runs once per query string, never on data.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

RECENCY_BOOST = 0.2  # reference query_intent.py recency boost constant

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "january february march april may june july august september october november december".split()
    )
}

_WORD_NUMS = {
    "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10,
}


def _start_of_week(d: datetime) -> datetime:
    return (d - timedelta(days=d.weekday())).replace(
        hour=0, minute=0, second=0, microsecond=0
    )


def _start_of_month(d: datetime) -> datetime:
    return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)


def _day(d: datetime) -> datetime:
    return d.replace(hour=0, minute=0, second=0, microsecond=0)


def classify_intent(query: str, now: datetime) -> dict:
    """Classify one query string.

    Returns ``{"since", "until", "suppress_graph", "recency_boost"}``
    (datetimes or None). An explicit time window implies
    ``suppress_graph`` (temporal questions want temporal evidence,
    not neighborhood expansion); "recently"/"latest"-style phrasing
    adds a recency boost instead of a hard window.
    """
    q = query.lower()
    out: dict = {"since": None, "until": None, "suppress_graph": False, "recency_boost": 0.0}

    def window(since: datetime, until: datetime | None = None) -> None:
        out["since"], out["until"] = since, until
        out["suppress_graph"] = True

    if re.search(r"\btoday\b", q):
        window(_day(now))
    elif re.search(r"\byesterday\b", q):
        d = _day(now) - timedelta(days=1)
        window(d, d + timedelta(days=1))
    elif re.search(r"\blast week\b", q):
        sow = _start_of_week(now)
        window(sow - timedelta(days=7), sow)
    elif re.search(r"\bthis week\b", q):
        window(_start_of_week(now))
    elif re.search(r"\blast month\b", q):
        som = _start_of_month(now)
        prev = (som - timedelta(days=1)).replace(day=1)
        window(prev, som)
    elif re.search(r"\bthis month\b", q):
        window(_start_of_month(now))
    else:
        m = re.search(r"\b(\d+|" + "|".join(_WORD_NUMS) + r")\s+days?\s+ago\b", q)
        if m:
            n = int(m.group(1)) if m.group(1).isdigit() else _WORD_NUMS[m.group(1)]
            d = _day(now) - timedelta(days=n)
            window(d, d + timedelta(days=1))
        else:
            m = re.search(r"\bin\s+(" + "|".join(_MONTHS) + r")\b", q)
            if m:
                month = _MONTHS[m.group(1)]
                year = now.year if month <= now.month else now.year - 1
                since = datetime(year, month, 1)
                until = (
                    datetime(year + 1, 1, 1)
                    if month == 12
                    else datetime(year, month + 1, 1)
                )
                window(since, until)

    if re.search(r"\b(recent(ly)?|lately|latest|current|newest)\b", q):
        out["recency_boost"] = RECENCY_BOOST

    return out


def apply_intent(params: dict, intent: dict) -> dict:
    """Merge: caller-provided params always win (reference
    query_intent.py:266-305 — auto-intent only fills gaps)."""
    merged = dict(params)
    for key in ("since", "until"):
        if merged.get(key) is None and intent[key] is not None:
            merged[key] = intent[key]
    if merged.get("graph_weight") is None and intent["suppress_graph"]:
        merged["graph_weight"] = 0.0
    if not merged.get("recency_weight") and intent["recency_boost"]:
        merged["recency_weight"] = intent["recency_boost"]
    return merged
