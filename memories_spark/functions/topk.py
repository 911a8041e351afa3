"""Distributed top-N with ranks.

The naive "rank everything, filter rank <= N" shape puts the WHOLE
input through one task: an unpartitioned ``row_number`` window is a
single-partition sort, the shuffle that dies first at 100 TB. Taking
the top N via ``orderBy().limit()`` first lets Catalyst plan a
TakeOrderedAndProject — per-partition top-N, merged — and the rank
window then runs over at most N rows. Same rows, same ranks: the
truncated total order is identical either way (callers must pass a
DETERMINISTIC total order — tie-break on a unique id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame, order: list[Column], n: int, rank_col: str = "rank"
) -> DataFrame:
    """Top ``n`` rows of ``df`` under ``order`` with a 1-based
    ``rank_col`` (long), without a full-input single-partition sort."""
    limited = df.orderBy(*order).limit(n)
    w = Window.orderBy(*order)
    return limited.withColumn(
        rank_col, F.row_number().over(w).cast("long")
    )
