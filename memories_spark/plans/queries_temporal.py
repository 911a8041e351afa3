"""Temporal / lifecycle / event-stream queries: sessionization,
tumbling windows, null-pass temporal filters, profile cascades,
policy enforcement, stale-entity detection, confidence decay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.decay import decay_sql, half_life_decay
from memories_spark.operators import lifecycle as lc_op
from memories_spark.operators import temporal as temp_op
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Sessionization + tumbling windows
# ---------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH base AS ({temp_op.session_stats_sql('events')})
SELECT user_id, session_id, n_events, session_start, session_end,
       round(CAST(_v_cents AS DOUBLE) / 100.0, 2) AS total_value
FROM base ORDER BY user_id, session_id
"""


@register(
    "sessionize_events",
    oracle=_SESSION_ORACLE,
    bench=True,
    doc="Gap-based sessionization (30-min gap): lag + cumulative "
    "break-sum windows, one shuffle on user_id. Batch twin of "
    "streaming session windows.",
    tags=("events", "window"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    stats = temp_op.session_stats(ev)
    return stats.select(
        "user_id",
        "session_id",
        "n_events",
        "session_start",
        "session_end",
        F.round(F.col("_v_cents").cast("double") / 100.0, 2).alias("total_value"),
    ).orderBy("user_id", "session_id")


@register(
    "tumbling_event_counts",
    oracle=temp_op.tumbling_counts_sql("events"),
    doc="1-hour tumbling-window counts/sums per event type (batch "
    "twin of the streaming windowed aggregation; reference A4/A6 "
    "period buckets, usage_tracker.py:364-534).",
    tags=("events", "window"),
)
def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return temp_op.tumbling_counts(ev)


# ---------------------------------------------------------------------
# Temporal filter with NULL-pass semantics (reference F4)
# ---------------------------------------------------------------------

_ANCHOR_SQL = "(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END)"
_NULLPASS_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {_ANCHOR_SQL} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_anchor
FROM orders
WHERE {temp_op.temporal_filter_sql(_ANCHOR_SQL, '1996-01-01 00:00:00', '1997-12-31 00:00:00')}
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register(
    "temporal_nullpass_filter",
    oracle=_NULLPASS_ORACLE,
    doc="Since/until filter where NULL anchors PASS (reference F4 "
    "_passes_temporal_filter, memory_engine.py:1467-1488 — missing "
    "dates never exclude a row).",
    tags=("filter", "temporal"),
)
def temporal_nullpass_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    anchor = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("timestamp")).otherwise(
        F.col("o_orderdate")
    )
    filtered = temp_op.temporal_filter(
        orders, anchor, since="1996-01-01 00:00:00", until="1997-12-31 00:00:00"
    )
    return (
        filtered.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(anchor.isNull(), 1).otherwise(0)).cast("long").alias("n_null_anchor"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------
# Longest-prefix profile resolution (reference J10)
# ---------------------------------------------------------------------

_PROFILES = [("src", 180), ("src1", 30), ("src19", 7)]

_PROFILE_ORACLE = f"""
WITH profiles(source_prefix, ttl_days) AS (
  VALUES {', '.join(f"('{p}', {t})" for p, t in _PROFILES)}
),
matched AS (
  SELECT s.source, p.source_prefix, p.ttl_days,
         row_number() OVER (PARTITION BY s.source
                            ORDER BY length(p.source_prefix) DESC, p.source_prefix ASC) AS rn
  FROM (SELECT DISTINCT source FROM documents) s
  LEFT JOIN profiles p ON s.source LIKE p.source_prefix || '%'
)
SELECT source, source_prefix AS matched_prefix, CAST(ttl_days AS BIGINT) AS ttl_days
FROM matched WHERE rn = 1 ORDER BY source
"""


@register(
    "profile_prefix_resolve",
    oracle=_PROFILE_ORACLE,
    doc="Longest-prefix-wins policy cascade (reference J10, "
    "extraction_profiles.py:68-113): broadcast theta-join on "
    "startswith + keep-longest window.",
    tags=("join", "lifecycle"),
)
def profile_prefix_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    profiles = spark.createDataFrame(_PROFILES, "source_prefix string, ttl_days long")
    sources = docs.select("source").distinct()
    resolved = lc_op.resolve_profiles(sources, profiles, id_col="source")
    return resolved.select(
        "source",
        F.col("source_prefix").alias("matched_prefix"),
        F.col("ttl_days").cast("long").alias("ttl_days"),
    ).orderBy("source")


# ---------------------------------------------------------------------
# Lifecycle policy enforcement (reference C6)
# ---------------------------------------------------------------------

_POLICY_NOW = "2002-01-01 00:00:00"
_TTL_CASE = (
    "CASE o_orderpriority WHEN '1-URGENT' THEN 2400 WHEN '2-HIGH' THEN 2200 "
    "WHEN '3-MEDIUM' THEN 2000 WHEN '4-NOT SPECIFIED' THEN 1800 ELSE 1600 END"
)
_AGE_SQL = (
    f"greatest((epoch_us(TIMESTAMP '{_POLICY_NOW}') - epoch_us(o_orderdate))"
    " / 86400000000.0, 0.0)"
)
_CONF_SQL = f"power(0.5, {_AGE_SQL} / 900.0)"
_POLICY_ORACLE = f"""
WITH decided AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 100 = 0 THEN NULL
              WHEN {_AGE_SQL} > {_TTL_CASE} THEN 'ttl_expired'
              WHEN {_CONF_SQL} < 0.15 AND {_AGE_SQL} > 1500 THEN 'low_confidence'
              ELSE NULL END AS archive_reason
  FROM orders
)
SELECT o_orderpriority, coalesce(archive_reason, 'keep') AS archive_reason,
       CAST(count(*) AS BIGINT) AS n
FROM decided GROUP BY 1, 2 ORDER BY o_orderpriority, archive_reason
"""


@register(
    "lifecycle_policy_enforce",
    oracle=_POLICY_ORACLE,
    doc="Policy enforcement scan (reference C6 enforce_policies, "
    "memory_engine.py:1080-1248): archive when age > ttl OR "
    "(confidence < threshold AND age > min_age); pinned rows "
    "(synthetic: orderkey%100==0) always kept; dry-run-style rollup.",
    tags=("lifecycle", "decay"),
)
def lifecycle_policy_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    now = F.lit(_POLICY_NOW).cast("timestamp")
    age = F.greatest(
        (F.unix_micros(now) - F.unix_micros(F.col("o_orderdate"))).cast("double")
        / F.lit(86_400_000_000.0),
        F.lit(0.0),
    )
    conf = F.pow(F.lit(0.5), age / F.lit(900.0))
    ttl = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 2400)
        .when(F.col("o_orderpriority") == "2-HIGH", 2200)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 2000)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 1800)
        .otherwise(1600)
    )
    reason = lc_op.archive_decision(
        age_days=age,
        confidence=conf,
        ttl_days=ttl,
        conf_threshold=F.lit(0.15),
        min_age_days=F.lit(1500),
        pinned=F.col("o_orderkey") % 100 == 0,
    )
    return (
        orders.select("o_orderpriority", F.coalesce(reason, F.lit("keep")).alias("archive_reason"))
        .groupBy("o_orderpriority", "archive_reason")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority", "archive_reason")
    )


# ---------------------------------------------------------------------
# Confidence decay ranking (reference R5) + stale entities (J9)
# ---------------------------------------------------------------------

_CONFIDENCE_ORACLE = f"""
SELECT o_orderkey,
       round({decay_sql('o_orderdate', '2002-01-01 00:00:00', 900.0)}, 6) AS confidence
FROM orders
ORDER BY confidence DESC, o_orderkey ASC
LIMIT 100
"""


@register(
    "confidence_topk",
    oracle=_CONFIDENCE_ORACLE,
    doc="Confidence decay 0.5^(age/half_life), half-life 900d "
    "(reference R5 compute_confidence, memory_engine.py:920-963).",
    tags=("decay", "topk"),
)
def confidence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    anchor = F.lit("2002-01-01 00:00:00").cast("timestamp")
    conf = F.round(half_life_decay(F.col("o_orderdate"), anchor, 900.0), 6)
    return (
        orders.select("o_orderkey", conf.alias("confidence"))
        .orderBy(F.desc("confidence"), F.asc("o_orderkey"))
        .limit(100)
    )


_STALE_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks
FROM events
GROUP BY user_id
HAVING sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) >= 3
   AND sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 1
   AND sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
ORDER BY user_id
"""


@register(
    "stale_entities",
    oracle=_STALE_ORACLE,
    doc="Stale-entity detection (reference J9 get_stale_memories, "
    "usage_tracker.py:835-861): frequently seen, engaged, never "
    "converting — conditional aggregate + HAVING.",
    tags=("events", "agg"),
)
def stale_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    c = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    agg = ev.groupBy("user_id").agg(
        c("view").cast("long").alias("n_views"),
        c("click").cast("long").alias("n_clicks"),
        c("purchase").cast("long").alias("n_purchases"),
    )
    return (
        agg.filter(
            (F.col("n_views") >= 3) & (F.col("n_clicks") >= 1) & (F.col("n_purchases") == 0)
        )
        .select("user_id", "n_views", "n_clicks")
        .orderBy("user_id")
    )
