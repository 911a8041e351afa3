"""Temporal semantics: anchored since/until filters, sessionization,
tumbling windows.

Temporal filter (reference F4, memory_engine.py:1467-1488): the
anchor is the first non-null of (document_at, created_at, timestamp)
and rows with NO parseable anchor PASS the filter — an important
reference semantic the tests pin down.

Sessionization / tumbling windows are the batch twins of the
Structured Streaming operators in memories_spark.streaming: same
logic, expressed over a static event table with window functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def temporal_filter(
    df: DataFrame,
    anchor: Column,
    since: str | None = None,
    until: str | None = None,
) -> DataFrame:
    """Keep rows whose anchor is within [since, until] — or NULL.

    NULL-anchor rows pass unconditionally (reference
    memory_engine.py:1477-1488: unparseable dates never exclude).
    """
    cond = F.lit(True)
    if since is not None:
        cond = cond & (anchor >= F.lit(since).cast("timestamp"))
    if until is not None:
        cond = cond & (anchor <= F.lit(until).cast("timestamp"))
    return df.filter(anchor.isNull() | cond)


def temporal_filter_sql(anchor: str, since: str | None, until: str | None) -> str:
    parts = []
    if since is not None:
        parts.append(f"{anchor} >= TIMESTAMP '{since}'")
    if until is not None:
        parts.append(f"{anchor} <= TIMESTAMP '{until}'")
    in_range = " AND ".join(parts) if parts else "TRUE"
    return f"({anchor} IS NULL OR ({in_range}))"


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-breaks; one shuffle on user_id.
    Returns events + (session_id starting at 1 per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(w)
    is_break = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_minutes * 60_000_000),
        1,
    ).otherwise(0)
    return events.withColumn("session_id", F.sum(is_break).over(w).cast("long"))


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(events, gap_minutes=gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("_v_cents"),
    )


def session_stats_sql(events_view: str, gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH ordered AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM {events_view}
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) - epoch_us(prev_ts)) > {gap_us}
                 THEN 1 ELSE 0 END AS is_break
  FROM ordered
),
sessions AS (
  SELECT *, CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS _v_cents
FROM sessions
GROUP BY user_id, session_id
"""


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event_type (batch twin of the
    streaming windowed aggregation)."""
    win = F.window("ts", width)
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("_v_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            F.round(F.col("_v_cents").cast("double") / 100.0, 2).alias("total_value"),
        )
    )


def tumbling_counts_sql(events_view: str) -> str:
    return f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0, 2) AS total_value
FROM {events_view}
GROUP BY 1, 2
"""
