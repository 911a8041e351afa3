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


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Every row of ``df`` with its global 1-based ``row_number`` under
    ``order`` (long), WITHOUT a single-partition window.

    ``ranked_topk`` covers "keep the top N"; this covers "rank them
    all" (ntile, percentile cuts, offset arithmetic) where truncation
    is not an option and the naive ``row_number() OVER (ORDER BY ...)``
    funnels the whole input through one task. Two-phase plan instead:

    1. ``repartitionByRange(order)`` + ``sortWithinPartitions(order)``
       — partition p holds a contiguous slice of the global order, each
       slice sorted locally (one range shuffle, fully parallel).
    2. ``monotonically_increasing_id`` packs (partition_id, local
       position) into one long; a per-partition count aggregate
       (#partitions rows of metadata) turned into cumulative offsets by
       a window over THOSE counts — bounded by the shuffle-partition
       count, never by the data — then broadcast back, so the global
       rank is ``offset + local_pos + 1``: pure map-side arithmetic.

    Both the count branch and the main branch hang off the same range
    exchange, so Catalyst's ReuseExchange materializes the shuffle once
    and both sides read identical partition layouts (the determinism
    the bit-unpacking needs).

    ``order`` must be a deterministic TOTAL order (tie-break on a
    unique id) — ties straddling a range boundary would otherwise be
    ranked by partition placement. With ``total_col`` set, every row
    also carries the total row count (broadcast scalar), which is what
    ``ntile_from_rank`` consumes."""
    arranged = df.repartitionByRange(*order).sortWithinPartitions(*order)
    tagged = arranged.withColumn("_gr_mid", F.monotonically_increasing_id())
    pid = F.shiftrightunsigned(F.col("_gr_mid"), 33)
    pos = F.col("_gr_mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = tagged.groupBy(pid.alias("_gr_pid")).agg(
        F.count("*").alias("_gr_n")
    )
    cum = Window.orderBy("_gr_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_gr_pid", F.coalesce(F.sum("_gr_n").over(cum), F.lit(0)).alias("_gr_off")
    )
    out = (
        tagged.withColumn("_gr_pid", pid)
        .join(F.broadcast(offs), "_gr_pid")
        .withColumn(rank_col, (F.col("_gr_off") + pos + F.lit(1)).cast("long"))
        .drop("_gr_pid", "_gr_mid", "_gr_off")
    )
    if total_col is not None:
        tot = counts.agg(F.sum("_gr_n").cast("long").alias(total_col))
        out = out.crossJoin(F.broadcast(tot))
    return out


def ntile_from_rank(rank_col: str, total_col: str, k: int) -> Column:
    """SQL-standard ``ntile(k)`` as closed-form arithmetic over a
    global rank and total count (both long columns) — the map-side
    companion to ``global_rank(total_col=...)``.

    ntile semantics: with ``n`` rows, the first ``n % k`` tiles get
    ``n DIV k + 1`` rows, the rest get ``n DIV k``. The CASE guards the
    ``q = 0`` (n < k) branch — every row then lands in the first arm."""
    q = f"({total_col} DIV {k})"
    rem = f"({total_col} % {k})"
    big = f"({rem} * ({q} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {big} "
        f"THEN ({rank_col} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {rem} + ({rank_col} - {big} - 1) DIV {q} + 1 END AS BIGINT)"
    )
