"""Catalog / data-management shapes: SCD2 validity intervals from an
event log, and a long-format column profiler.

The reference versions records with ``supersedes`` links and
``is_latest`` flags (llm_extract.py:605-606, SURVEY M4): the
relational formulation of the same idea is SCD2 — each observation
valid from its timestamp until the next one. The column profiler is
the reference's ``stats``/``stats_light`` (memory_engine.py:2766-2790)
generalized to per-column physical statistics, the first query a
migrating user runs against an unfamiliar table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# SCD2 validity intervals from the event log
# ---------------------------------------------------------------------

_SCD2_ORACLE = """
WITH obs AS (
  SELECT user_id, ts,
         CAST(round(value * 100.0) AS BIGINT) AS value_c,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS version
  FROM events WHERE event_type = 'signup'
)
SELECT user_id, CAST(version AS BIGINT) AS version,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
       CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current,
       round(CAST(value_c AS DOUBLE) / 100.0, 2) AS value
FROM obs
WHERE user_id < 20
ORDER BY user_id, version
"""


@register(
    "scd2_validity_intervals",
    oracle=_SCD2_ORACLE,
    doc="SCD2 (type-2 slowly-changing-dimension) history built from an "
    "observation log: per entity, each row is valid from its own "
    "timestamp until the next observation (lead window), the last "
    "one open-ended and flagged current. This is the relational twin "
    "of the reference's supersedes/is_latest versioning "
    "(llm_extract.py:605-606, M4 supersede): version = row_number, "
    "is_current = no successor. Plan: ONE window shuffle on entity "
    "id serves lead + row_number (same partitioning/ordering), "
    "event_type pushed to the scan, deterministic ts+event_id "
    "ordering.",
    tags=("catalog", "scd2", "window"),
)
def scd2_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    obs = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100.0).cast("long").alias("value_c"),
        )
        .withColumn("next_ts", F.lead("ts").over(w))
        .withColumn("version", F.row_number().over(w))
    )
    return (
        obs.filter(F.col("user_id") < 20)
        .select(
            "user_id",
            F.col("version").cast("long").alias("version"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.coalesce(
                F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss"),
                F.lit("9999-12-31 00:00:00"),
            ).alias("valid_to"),
            F.when(F.col("next_ts").isNull(), 1).otherwise(0).cast("long").alias("is_current"),
            F.round(F.col("value_c").cast("double") / 100.0, 2).alias("value"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------
# Long-format column profiler
# ---------------------------------------------------------------------

_PROFILE_ORACLE = """
SELECT 'event_id' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(event_id) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS VARCHAR) AS min_value,
       CAST(max(event_id) AS VARCHAR) AS max_value
FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) AS BIGINT), CAST(count(user_id) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
FROM events
UNION ALL
SELECT 'event_type', CAST(count(*) AS BIGINT), CAST(count(event_type) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT),
       min(event_type), max(event_type)
FROM events
UNION ALL
SELECT 'value', CAST(count(*) AS BIGINT), CAST(count(value) AS BIGINT),
       CAST(count(DISTINCT CAST(round(value * 100.0) AS BIGINT)) AS BIGINT),
       CAST(round(min(value), 2) AS VARCHAR), CAST(round(max(value), 2) AS VARCHAR)
FROM events
ORDER BY column_name
"""


@register(
    "events_column_profile",
    oracle=_PROFILE_ORACLE,
    doc="Long-format column profiler over the events table: per "
    "column, row/non-null/distinct counts and min/max rendered as "
    "strings — the table-discovery query (reference stats/"
    "stats_light, memory_engine.py:2766-2790, generalized per "
    "column). Plan: Spark computes ALL columns' statistics in ONE "
    "aggregate over one scan (count/min/max fuse into a single "
    "HashAggregate; the distinct counts use the two-phase "
    "partial-distinct expand), then unpivots the 1-row wide result "
    "with stack() — the oracle's four-scan UNION ALL shape would "
    "read the table once per column. Doubles profile on their "
    "cents fixed-point for the distinct count so engines agree.",
    tags=("catalog", "profile", "agg"),
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    agg = ev.agg(
        F.count("*").alias("n_rows"),
        F.count("event_id").alias("nn_event_id"),
        F.countDistinct("event_id").alias("nd_event_id"),
        F.min("event_id").cast("string").alias("min_event_id"),
        F.max("event_id").cast("string").alias("max_event_id"),
        F.count("user_id").alias("nn_user_id"),
        F.countDistinct("user_id").alias("nd_user_id"),
        F.min("user_id").cast("string").alias("min_user_id"),
        F.max("user_id").cast("string").alias("max_user_id"),
        F.count("event_type").alias("nn_event_type"),
        F.countDistinct("event_type").alias("nd_event_type"),
        F.min("event_type").alias("min_event_type"),
        F.max("event_type").alias("max_event_type"),
        F.count("value").alias("nn_value"),
        F.countDistinct(F.round(F.col("value") * 100.0).cast("long")).alias("nd_value"),
        F.round(F.min("value"), 2).cast("string").alias("min_value"),
        F.round(F.max("value"), 2).cast("string").alias("max_value"),
    )
    stacked = agg.select(
        F.expr(
            "stack(4, "
            "'event_id', n_rows, nn_event_id, nd_event_id, min_event_id, max_event_id, "
            "'user_id', n_rows, nn_user_id, nd_user_id, min_user_id, max_user_id, "
            "'event_type', n_rows, nn_event_type, nd_event_type, min_event_type, max_event_type, "
            "'value', n_rows, nn_value, nd_value, min_value, max_value"
            ") AS (column_name, n_rows, n_nonnull, n_distinct, min_value, max_value)"
        )
    )
    return stacked.select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nonnull").cast("long").alias("n_nonnull"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    ).orderBy("column_name")


# ---------------------------------------------------------------------
# Window-function vocabulary in one pass
# ---------------------------------------------------------------------

_WINVOCAB_ORACLE = """
SELECT user_id, event_id,
       CAST(seq AS BIGINT) AS seq,
       CAST(prev_id AS BIGINT) AS prev_id,
       CAST(next_id AS BIGINT) AS next_id,
       CAST(first_id AS BIGINT) AS first_id,
       CAST(last_id AS BIGINT) AS last_id,
       round(pr, 6) AS pct_rank,
       round(cd, 6) AS cume_d,
       CAST(quartile AS BIGINT) AS quartile
FROM (
  SELECT user_id, event_id,
         row_number()  OVER w AS seq,
         lag(event_id)  OVER w AS prev_id,
         lead(event_id) OVER w AS next_id,
         first_value(event_id) OVER w AS first_id,
         last_value(event_id)  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id,
         percent_rank() OVER w AS pr,
         cume_dist()    OVER w AS cd,
         ntile(4)       OVER w AS quartile
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
WHERE user_id < 5
ORDER BY user_id, seq
"""


@register(
    "window_function_vocabulary",
    oracle=_WINVOCAB_ORACLE,
    doc="The full analytic window-function vocabulary in one pass: "
    "row_number, lag/lead, first/last_value (with the explicit "
    "unbounded frame last_value needs), percent_rank, cume_dist and "
    "ntile over the same (user, event-time) window. One window "
    "shuffle serves every function — Spark fuses same-spec window "
    "expressions into a single Window operator, so adding functions "
    "costs no extra passes; the deliberately different last_value "
    "frame is the one extra frame evaluation. The ordering ties on "
    "event_id so ranks are deterministic.",
    tags=("window", "catalog"),
)
def window_function_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.filter(F.col("user_id") < 5)
        .select(
            "user_id",
            "event_id",
            F.row_number().over(w).cast("long").alias("seq"),
            F.lag("event_id").over(w).cast("long").alias("prev_id"),
            F.lead("event_id").over(w).cast("long").alias("next_id"),
            F.first("event_id").over(w).cast("long").alias("first_id"),
            F.last("event_id").over(wfull).cast("long").alias("last_id"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_d"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("user_id", "seq")
    )
