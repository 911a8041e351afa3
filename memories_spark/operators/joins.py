"""As-of and range joins: the temporal join shapes an event/training
pipeline needs that neither the reference nor Spark has as built-ins
(the reference has no join engine at all — SURVEY §2.3: "there are no
sort-merge/theta/range/as-of joins in the reference").

Both are deliberately expressed so the 100 TB physical plan is an
equi-shuffle and never an inequality join (BroadcastNestedLoopJoin /
CartesianProduct — the classic range-join blowup):

- ``asof_join``: the union→window trick. Tag both sides, union them,
  sort per key by (ts, side, tiebreak) and carry the right side's
  payload forward with ``last(ignorenulls)``. ONE shuffle on the key,
  zero join operators, linear in |left|+|right| — the same strategy
  kdb/Flink use for temporal joins. Backward-looking and inclusive
  (right.ts <= left.ts); ties on ts resolve to the largest tiebreak.

- ``bucketed_range_join``: point-in-interval containment rewritten as
  an equi-join on (key, time_bucket). The interval side explodes to
  every bucket it overlaps (≤ ceil(len/width)+1 rows with width ≥
  interval length), the point side maps to exactly one bucket, and
  the exact range predicate is re-applied after the equi-join. Each
  qualifying (point, interval) pair appears exactly once, so no
  post-join dedup is needed. This is the manual form of the binning
  optimization range-join engines apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_vals: list[str],
    tiebreak: str,
) -> DataFrame:
    """For every left row, attach ``right_vals`` from the latest right
    row of the same ``key`` with ``right.ts <= left.ts`` (NULLs when no
    such row exists).

    Both inputs must share the ``key`` and ``ts`` column names;
    ``right_vals`` (which must include ``tiebreak``) must be disjoint
    from the left schema. Equal-``ts`` ties pick the largest
    ``tiebreak``.
    """
    l2 = left.withColumn(_SIDE, F.lit(1))
    r2 = right.select(key, ts, *right_vals).withColumn(_SIDE, F.lit(0))
    # allowMissingColumns: left's extra columns become NULL on right
    # rows and vice versa — exactly the carrier shape the window needs.
    u = l2.unionByName(r2, allowMissingColumns=True)
    # Right rows (side 0) sort before left rows at the same ts, making
    # the join inclusive; among right ties the largest tiebreak is the
    # frame's last row. Left rows carry NULL payloads, so their mutual
    # order at equal ts cannot change any last(ignorenulls) result.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc(), F.col(tiebreak).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c not in right_vals],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_vals],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_s: int,
) -> DataFrame:
    """Inner-join points into half-open intervals ``[start, end)`` of
    the same ``key`` via time-bucket equi-join.

    ``bucket_width_s`` should be ≥ the typical interval length so each
    interval explodes to ~2 buckets. Output = interval columns +
    point columns for every containment pair; column names must be
    disjoint apart from ``key``.
    """
    width_us = F.lit(int(bucket_width_s) * 1_000_000)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / width_us),
                F.floor(F.unix_micros(F.col(end_ts)) / width_us),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.floor(F.unix_micros(F.col(point_ts)) / width_us))
    return (
        ivals.join(pts, [key, "_bucket"])
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("_bucket")
    )


def bucketed_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width_s: int,
) -> DataFrame:
    """Inner-join overlapping half-open interval pairs of the same
    ``key`` via time-bucket equi-join.

    Two intervals overlap iff they share a time point, and any shared
    point lies in a bucket both intervals cover — so exploding each
    side to its covered buckets and equi-joining on (key, bucket)
    finds every overlapping pair. The exact predicate
    ``l_start < r_end AND r_start < l_end`` then drops false bucket
    neighbors, and a distinct removes pairs that share several
    buckets. Never a nested-loop join; bucket width trades explode
    factor against join selectivity (use ~the typical interval
    length).
    """
    width_us = F.lit(int(bucket_width_s) * 1_000_000)

    def exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(s)) / width_us),
                    F.floor(F.unix_micros(F.col(e)) / width_us),
                )
            ),
        )

    pairs = exploded(left, l_start, l_end).join(
        exploded(right, r_start, r_end), [key, "_bucket"]
    )
    return (
        pairs.filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .drop("_bucket")
        .distinct()
    )
