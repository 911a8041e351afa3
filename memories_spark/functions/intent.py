"""Query-intent classification: regex temporal parsing of the query
string into search-parameter rewrites.

Full-parity mirror of the reference classifier (reference
query_intent.py:13-58 grammar tables, :105-253 precedence,
:266-305 caller-wins merge). The grammar, in the reference's
precedence order (first match wins, early return):

1. month range   — "from July to October", "between March and June"
2. single month  — "(in|from|during|month of) March" (+abbrevs)
3. yesterday
4. last period   — "last week|month|year"
5. last weekday  — "last Thursday"
6. N ago         — "3 days ago", "two weeks ago", "a month ago"
7. past N        — "past few months", "last 3 days" (since only)
8. this period   — "this week|month|year" (since only)
9. recency words — "recently|latest|most recent|newest" (boost only)

Notes pinned by tests: an explicit window implies ``suppress_graph``
(temporal questions want temporal evidence, not neighborhood
expansion) and returns NO recency boost even if the query also says
"latest" (reference early-returns per pattern); "today" is NOT a
temporal form in the reference grammar (query_intent.py has no such
pattern) so it yields no window; number words cover a/an/one..twelve
plus few=3, couple=2, several=4. Caller-provided parameters always
win (the rewrite only fills gaps). Pure driver-side function — it
runs once per query string, never on data; the data-parallel twin
over logged query tables is plans/queries_serving.py's
``query_intent_rewrite``.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

RECENCY_BOOST = 0.2  # reference query_intent.py:303

_WORD_TO_NUM = {
    "a": 1, "an": 1, "one": 1, "two": 2, "three": 3, "four": 4,
    "five": 5, "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10,
    "eleven": 11, "twelve": 12, "few": 3, "couple": 2, "several": 4,
}

_MONTH_NAMES = {
    "january": 1, "february": 2, "march": 3, "april": 4,
    "may": 5, "june": 6, "july": 7, "august": 8,
    "september": 9, "october": 10, "november": 11, "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4,
    "jun": 6, "jul": 7, "aug": 8,
    "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

_WEEKDAY_NAMES = {
    "monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
    "friday": 4, "saturday": 5, "sunday": 6,
}

_MONTH_PAT = "|".join(_MONTH_NAMES)
_WEEKDAY_PAT = "|".join(_WEEKDAY_NAMES)
_NUM_PAT = r"(?:\d+|" + "|".join(_WORD_TO_NUM) + ")"

_MONTH_RANGE = re.compile(
    rf"(?:from\s+|between\s+)({_MONTH_PAT})\s+(?:to|and)\s+({_MONTH_PAT})"
)
_IN_MONTH = re.compile(rf"(?:in|from|during|month\s+of)\s+({_MONTH_PAT})\b")
_YESTERDAY = re.compile(r"\byesterday\b")
_LAST_PERIOD = re.compile(r"\blast\s+(week|month|year)\b")
_LAST_WEEKDAY = re.compile(rf"\blast\s+({_WEEKDAY_PAT})\b")
_N_AGO = re.compile(rf"\b({_NUM_PAT})\s+(day|week|month|year)s?\s+ago\b")
_PAST_N = re.compile(rf"\b(?:past|last)\s+({_NUM_PAT})\s+(day|week|month|year)s?\b")
_THIS_PERIOD = re.compile(r"\bthis\s+(week|month|year)\b")
_RECENCY = re.compile(r"\b(?:recently|latest|most\s+recent|newest)\b")


def _day(d: datetime) -> datetime:
    return d.replace(hour=0, minute=0, second=0, microsecond=0)


def _eod(d: datetime) -> datetime:
    """End of day — reference _iso_end (query_intent.py:74-76); the
    engine's temporal filter is anchor <= until, so 23:59:59 covers
    the day inclusively."""
    return d.replace(hour=23, minute=59, second=59, microsecond=0)


def _parse_number(s: str) -> int:
    return int(s) if s.isdigit() else _WORD_TO_NUM.get(s, 1)


def _start_of_week(d: datetime) -> datetime:
    return _day(d - timedelta(days=d.weekday()))


def _end_of_week(d: datetime) -> datetime:
    return _start_of_week(d) + timedelta(days=6)


def _start_of_month(year: int, month: int) -> datetime:
    return datetime(year, month, 1)


def _end_of_month(year: int, month: int) -> datetime:
    return datetime(year, month, calendar.monthrange(year, month)[1])


def classify_intent(query: str, now: datetime) -> dict:
    """Classify one query string.

    Returns ``{"since", "until", "suppress_graph", "recency_boost"}``
    (since/until as datetimes or None, recency_boost a float weight).
    """
    q = query.lower()
    out: dict = {
        "since": None, "until": None,
        "suppress_graph": False, "recency_boost": 0.0,
    }

    def window(since: datetime, until: datetime | None = None) -> dict:
        out["since"], out["until"] = since, until
        out["suppress_graph"] = True
        return out

    # 1. month range (most specific; reference :111-124)
    m = _MONTH_RANGE.search(q)
    if m:
        m1, m2 = _MONTH_NAMES[m.group(1)], _MONTH_NAMES[m.group(2)]
        end_year = now.year if m2 <= now.month else now.year - 1
        start_year = end_year - 1 if m1 > m2 else end_year  # wrap Nov-Feb
        return window(
            _start_of_month(start_year, m1), _eod(_end_of_month(end_year, m2))
        )

    # 2. single month with year back-off (:126-135)
    m = _IN_MONTH.search(q)
    if m:
        mon = _MONTH_NAMES[m.group(1)]
        year = now.year if mon <= now.month else now.year - 1
        return window(_start_of_month(year, mon), _eod(_end_of_month(year, mon)))

    # 3. yesterday (:137-144)
    if _YESTERDAY.search(q):
        d = now - timedelta(days=1)
        return window(_day(d), _eod(d))

    # 4. last week/month/year (:146-172)
    m = _LAST_PERIOD.search(q)
    if m:
        period = m.group(1)
        if period == "week":
            mon = _start_of_week(now) - timedelta(weeks=1)
            return window(mon, _eod(_end_of_week(mon)))
        if period == "month":
            y, mth = (now.year - 1, 12) if now.month == 1 else (now.year, now.month - 1)
            return window(_start_of_month(y, mth), _eod(_end_of_month(y, mth)))
        return window(
            datetime(now.year - 1, 1, 1), _eod(datetime(now.year - 1, 12, 31))
        )

    # 5. last <weekday>: most recent strictly-past occurrence (:174-184)
    m = _LAST_WEEKDAY.search(q)
    if m:
        days_back = (now.weekday() - _WEEKDAY_NAMES[m.group(1)]) % 7 or 7
        d = now - timedelta(days=days_back)
        return window(_day(d), _eod(d))

    # 6. N <unit> ago (:186-211) — day/month/year pin one day; week
    #    pins the whole Mon..Sun week containing now - n weeks
    m = _N_AGO.search(q)
    if m:
        n, unit = _parse_number(m.group(1)), m.group(2)
        if unit == "week":
            mon = _start_of_week(now - timedelta(weeks=n))
            return window(mon, _eod(_end_of_week(mon)))
        days = {"day": n, "month": n * 30, "year": n * 365}[unit]
        d = now - timedelta(days=days)
        return window(_day(d), _eod(d))

    # 7. past/last N <unit>: open-ended since (:213-228)
    m = _PAST_N.search(q)
    if m:
        n, unit = _parse_number(m.group(1)), m.group(2)
        days = {"day": n, "week": n * 7, "month": n * 30, "year": n * 365}[unit]
        return window(_day(now - timedelta(days=days)))

    # 8. this week/month/year: open-ended since (:230-247)
    m = _THIS_PERIOD.search(q)
    if m:
        period = m.group(1)
        if period == "week":
            return window(_start_of_week(now))
        if period == "month":
            return window(_start_of_month(now.year, now.month))
        return window(datetime(now.year, 1, 1))

    # 9. vague recency: boost only, graph untouched (:249-251)
    if _RECENCY.search(q):
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
