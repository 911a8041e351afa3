"""Temporal join queries: as-of and range joins over the events table.

The reference has no join engine (SURVEY §2.3: no sort-merge / theta /
range / as-of joins), but an event/training pipeline needs both shapes;
operators/joins.py implements them so the physical plan is an
equi-shuffle, never a nested-loop range join. The DuckDB oracles are
genuinely independent implementations: native ``ASOF LEFT JOIN`` for
the as-of, a plain inequality join for the range containment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.operators import joins as join_op
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

_ASOF_ORACLE = f"""
WITH errs AS (
  SELECT user_id, ts, event_id AS error_event_id
  FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts, max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT e.user_id,
       e.error_event_id,
       strftime(e.ts, '{_TS_FMT_DUCK}') AS error_ts,
       c.click_event_id,
       strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
       CAST(epoch_us(e.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM errs e ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.user_id, e.error_event_id
"""


@register(
    "asof_last_click",
    oracle=_ASOF_ORACLE,
    bench=True,
    doc="Backward as-of join: for every error event, the same user's "
    "latest click at-or-before the error, plus the gap. Spark side is "
    "the union->window trick (one shuffle on user_id, zero join "
    "operators); the oracle is DuckDB's native ASOF LEFT JOIN — an "
    "independent implementation of the same semantics. The reference "
    "has no as-of join (SURVEY §2.3); this is pipeline-extension "
    "surface.",
    tags=("joins", "temporal", "pipeline"),
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    errs = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_event_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = join_op.asof_join(
        errs,
        clicks,
        key="user_id",
        ts="ts",
        right_vals=["click_event_id", "click_ts"],
        tiebreak="click_event_id",
    )
    return joined.select(
        "user_id",
        "error_event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("error_ts"),
        "click_event_id",
        F.date_format("click_ts", _TS_FMT_SPARK).alias("click_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))).alias("gap_us"),
    ).orderBy("user_id", "error_event_id")


_INCIDENT_MIN = 30

_RANGE_ORACLE = f"""
WITH errs AS (
  SELECT user_id, event_id AS error_event_id, ts
  FROM events WHERE event_type = 'error'
)
SELECT e.user_id,
       e.error_event_id,
       strftime(e.ts, '{_TS_FMT_DUCK}') AS window_start,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks,
       round(CAST(coalesce(sum(CAST(round(c.value * 100) AS BIGINT)), 0) AS DOUBLE) / 100.0, 2)
         AS clicked_value
FROM errs e LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL {_INCIDENT_MIN} MINUTE
GROUP BY e.user_id, e.error_event_id, e.ts
ORDER BY e.user_id, e.error_event_id
"""


@register(
    "range_join_incidents",
    oracle=_RANGE_ORACLE,
    bench=True,
    doc=f"Range join: every error event opens a {_INCIDENT_MIN}-minute "
    "incident window [ts, ts+30m); count the user's clicks and their "
    "value inside it (zero-click incidents kept). Spark side rewrites "
    "containment as an equi-join on (user_id, time_bucket) via "
    "bucketed_range_join — no BroadcastNestedLoopJoin at any scale; "
    "the oracle is DuckDB's plain inequality join.",
    tags=("joins", "temporal", "pipeline"),
)
def range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    errs = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {_INCIDENT_MIN} MINUTES")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    pairs = join_op.bucketed_range_join(
        clicks,
        errs,
        key="user_id",
        point_ts="click_ts",
        start_ts="start_ts",
        end_ts="end_ts",
        bucket_width_s=_INCIDENT_MIN * 60,
    )
    per_incident = pairs.groupBy("error_event_id").agg(
        F.count("click_id").alias("n_clicks"),
        F.sum(F.round(F.col("click_value") * 100).cast("long")).alias("_v_cents"),
    )
    return (
        errs.join(per_incident, "error_event_id", "left")
        .select(
            "user_id",
            "error_event_id",
            F.date_format("start_ts", _TS_FMT_SPARK).alias("window_start"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long").alias("n_clicks"),
            F.round(
                F.coalesce(F.col("_v_cents"), F.lit(0)).cast("double") / 100.0, 2
            ).alias("clicked_value"),
        )
        .orderBy("user_id", "error_event_id")
    )


# ---------------------------------------------------------------------
# Interval-overlap join: error incidents x purchase fulfillment windows
# ---------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH a AS (
  SELECT user_id, event_id AS a_id, ts AS a_start, ts + INTERVAL 30 MINUTE AS a_end
  FROM events WHERE event_type = 'error'
),
b AS (
  SELECT user_id, event_id AS b_id, ts AS b_start, ts + INTERVAL 45 MINUTE AS b_end
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT a.user_id, a.a_id, b.b_id,
         CAST(date_diff('microsecond',
                        greatest(a.a_start, b.b_start),
                        least(a.a_end, b.b_end)) AS BIGINT) AS overlap_us
  FROM a JOIN b ON a.user_id = b.user_id
   AND a.a_start < b.b_end AND b.b_start < a.a_end
)
SELECT user_id, a_id, b_id,
       round(CAST(overlap_us AS DOUBLE) / 60000000.0, 4) AS overlap_minutes
FROM pairs
ORDER BY overlap_minutes DESC, a_id ASC, b_id ASC
LIMIT 20
"""


@register(
    "interval_overlap_join",
    oracle=_OVERLAP_ORACLE,
    doc="Interval-interval overlap join: per user, 30-minute error "
    "incident windows against 45-minute purchase fulfillment "
    "windows, top-20 pairs by overlap duration. Spark rewrites the "
    "double-inequality overlap predicate as a (user, time-bucket) "
    "equi-join — overlapping intervals necessarily share a covered "
    "bucket — then applies the exact predicate and dedupes "
    "multi-bucket pairs; the DuckDB oracle runs the plain "
    "inequality join. Overlap minutes divide exact integer "
    "microseconds. The interval generalization of the point-in-"
    "range bucketed join (range_join_incidents).",
    tags=("joins", "temporal", "interval"),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    a = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_start"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("b_end"),
    )
    pairs = join_op.bucketed_interval_overlap_join(
        a, b, key="user_id",
        l_start="a_start", l_end="a_end",
        r_start="b_start", r_end="b_end",
        bucket_width_s=1800,
    )
    overlap_us = (
        F.unix_micros(F.least(F.col("a_end"), F.col("b_end")))
        - F.unix_micros(F.greatest(F.col("a_start"), F.col("b_start")))
    ).cast("long")
    return (
        pairs.select(
            "user_id",
            "a_id",
            "b_id",
            F.round(overlap_us.cast("double") / 60000000.0, 4).alias("overlap_minutes"),
        )
        .orderBy(F.desc("overlap_minutes"), F.asc("a_id"), F.asc("b_id"))
        .limit(20)
    )
