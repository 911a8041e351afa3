"""Exponential half-life decay scoring.

The reference scores recency as ``0.5 ** (age_days / half_life)``
with the anchor timestamp resolved by priority
``document_at -> created_at -> timestamp`` (reference
memory_engine.py:1442-1465), and confidence identically from
``last_reinforced_at -> updated_at -> created_at -> timestamp`` with
a 90-day default half-life (memory_engine.py:920-963). Missing
anchor => score 0.0; future anchor => 1.0.

Age is computed on exact microseconds (``unix_micros``) so the value
is a deterministic function of the stored timestamp — no DATE
truncation surprises, and the DuckDB oracle (``epoch_us``) produces
the identical double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_DAY = 86_400_000_000.0


def age_days_expr(anchor: Column, now: Column) -> Column:
    """Fractional days between anchor and 'now' (clamped at 0)."""
    raw = (F.unix_micros(now) - F.unix_micros(anchor)).cast("double") / F.lit(MICROS_PER_DAY)
    return F.greatest(raw, F.lit(0.0))


def half_life_decay(anchor: Column, now: Column, half_life_days: float | Column) -> Column:
    """``0.5 ** (age_days / half_life)``; NULL anchor -> 0.0, future -> 1.0."""
    hl = F.lit(half_life_days) if isinstance(half_life_days, (int, float)) else half_life_days
    score = F.pow(F.lit(0.5), age_days_expr(anchor, now) / hl)
    return F.when(anchor.isNull(), F.lit(0.0)).otherwise(score)


def decay_sql(anchor: str, now_literal: str, half_life_days: float) -> str:
    """DuckDB oracle mirror of :func:`half_life_decay`."""
    age = (
        f"greatest((epoch_us(TIMESTAMP '{now_literal}') - epoch_us({anchor}))"
        f" / 86400000000.0, 0.0)"
    )
    return (
        f"CASE WHEN {anchor} IS NULL THEN 0.0 "
        f"ELSE power(0.5, {age} / {half_life_days}) END"
    )
