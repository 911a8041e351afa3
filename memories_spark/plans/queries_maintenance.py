"""Maintenance / accounting queries: prune candidates, compaction
candidates, token-cost accounting, multi-backend result merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# C5: prune candidates — never-retrieved AND over the category threshold
# ---------------------------------------------------------------------

_PRUNE_ORACLE = """
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT DISTINCT user_id FROM events)
  AND d.n_chars > CASE WHEN d.lang = 'en' THEN 900
                       WHEN d.lang = 'de' THEN 700 ELSE 500 END
ORDER BY d.doc_id
"""


@register(
    "prune_candidates",
    oracle=_PRUNE_ORACLE,
    doc="Prune candidates (reference C5, consolidator.py:221-278): "
    "never-retrieved (anti-join vs the event log) AND over a "
    "per-category threshold (CASE predicate). lang plays category, "
    "n_chars plays age.",
    tags=("maintenance", "antijoin"),
)
def prune_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    retrieved = t["events"].select(F.col("user_id").alias("doc_id")).distinct()
    threshold = (
        F.when(F.col("lang") == "en", 900).when(F.col("lang") == "de", 700).otherwise(500)
    )
    return (
        t["documents"]
        .join(F.broadcast(retrieved), "doc_id", "left_anti")
        .filter(F.col("n_chars") > threshold)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# C7: compaction candidates — >=3 members within 80% of the local best
# ---------------------------------------------------------------------

_COMPACT_ORACLE = """
WITH scored AS (
  SELECT source, doc_id, n_chars,
         max(n_chars) OVER (PARTITION BY source) AS best
  FROM documents
),
members AS (
  SELECT source, doc_id, n_chars, best
  FROM scored
  WHERE CAST(n_chars AS DOUBLE) >= 0.8 * best
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(best) AS BIGINT) AS best_chars
FROM members
GROUP BY source
HAVING count(*) >= 3
ORDER BY source
"""


@register(
    "compaction_candidates",
    oracle=_COMPACT_ORACLE,
    doc="Compaction-candidate detection (reference C7, "
    "llm_extract.py:774-809): per group, members whose score is "
    "within 80% of the local best; groups with >=3 such members "
    "flagged. Window ratio-to-max + HAVING.",
    tags=("maintenance", "window"),
)
def compaction_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source")
    scored = docs.select(
        "source", "doc_id", "n_chars", F.max("n_chars").over(w).alias("best")
    )
    members = scored.filter(F.col("n_chars").cast("double") >= 0.8 * F.col("best"))
    return (
        members.groupBy("source")
        .agg(F.count("*").alias("n_members"), F.max("best").cast("long").alias("best_chars"))
        .filter(F.col("n_members") >= 3)
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# A9: token/usage accounting with per-model pricing
# ---------------------------------------------------------------------

_PRICES = [("click", 3.0), ("view", 0.25), ("purchase", 15.0), ("error", 1.0), ("share", 2.0)]

_COST_ORACLE = f"""
WITH prices(event_type, usd_per_1k) AS (
  VALUES {', '.join(f"('{t}', {p})" for t, p in _PRICES)}
),
usage AS (
  SELECT event_type, CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS tokens
  FROM events GROUP BY event_type
)
SELECT u.event_type, u.tokens,
       round(CAST(CAST(round(CAST(u.tokens AS DOUBLE) / 1000.0 * p.usd_per_1k * 100) AS BIGINT) AS DOUBLE) / 100.0, 2) AS cost_usd
FROM usage u JOIN prices p ON p.event_type = u.event_type
ORDER BY u.event_type
"""


@register(
    "token_cost_accounting",
    oracle=_COST_ORACLE,
    doc="Token/usage accounting (reference A9, usage_tracker.py:"
    "602-663): per-model token sums joined to a broadcast price "
    "sheet; cost in exact cents. value*1000 plays token counts, "
    "event_type plays model.",
    tags=("agg", "events"),
)
def token_cost_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    prices = ev.sparkSession.createDataFrame(_PRICES, "event_type string, usd_per_1k double")
    usage = ev.groupBy("event_type").agg(
        F.sum(F.round(F.col("value") * 1000).cast("long")).alias("tokens")
    )
    cost_cents = F.round(
        F.col("tokens").cast("double") / 1000.0 * F.col("usd_per_1k") * 100
    ).cast("long")
    return (
        usage.join(F.broadcast(prices), "event_type")
        .select(
            "event_type",
            "tokens",
            F.round(cost_cents.cast("double") / 100.0, 2).alias("cost_usd"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# T7: multi-backend result merge — union + exact-text dedup
# ---------------------------------------------------------------------

_BACKEND_ORACLE = """
WITH backend_a AS (
  SELECT doc_id, text, 'primary' AS backend FROM documents WHERE doc_id % 2 = 0
),
backend_b AS (
  SELECT doc_id, text, 'secondary' AS backend FROM documents WHERE doc_id % 3 = 0
),
unioned AS (
  SELECT * FROM backend_a UNION ALL SELECT * FROM backend_b
),
deduped AS (
  SELECT doc_id, backend,
         row_number() OVER (PARTITION BY text ORDER BY backend ASC, doc_id ASC) AS rn
  FROM unioned
)
SELECT doc_id, backend FROM deduped WHERE rn = 1 ORDER BY doc_id, backend
"""


@register(
    "multi_backend_merge",
    oracle=_BACKEND_ORACLE,
    doc="Multi-backend fan-out merge (reference T7, CHANGELOG 4.0.0 "
    "mcp-server): union of per-backend result sets, exact-text "
    "dedup keeping the priority backend, provenance retained.",
    tags=("union", "dedup"),
)
def multi_backend_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", F.lit("primary").alias("backend")
    )
    b = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "text", F.lit("secondary").alias("backend")
    )
    unioned = a.unionByName(b)
    w = Window.partitionBy("text").orderBy(F.asc("backend"), F.asc("doc_id"))
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "backend")
        .orderBy("doc_id", "backend")
    )


# ---------------------------------------------------------------------
# A5: extraction-quality metrics — per-source outcome rollup
# ---------------------------------------------------------------------

_A5_ORACLE = """
SELECT 'j' || CAST(user_id % 7 AS VARCHAR) AS job_source,
       CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS stored,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS updated,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS deleted,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS noop,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conflict,
       round(CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS noop_ratio,
       CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1 ORDER BY job_source
"""


@register(
    "extraction_outcome_rollup",
    oracle=_A5_ORACLE,
    doc="Extraction-quality metrics (reference A5, usage_tracker.py:"
    "536-600): per-source conditional sums of each AUDN outcome plus "
    "noop ratio; event_type plays the outcome, user_id%7 plays the "
    "job source, and props JSON carries a token-count payload parsed "
    "with get_json_object.",
    tags=("agg", "events", "json"),
)
def extraction_outcome_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    out = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        ev.groupBy(
            F.concat(F.lit("j"), (F.col("user_id") % 7).cast("string")).alias("job_source")
        )
        .agg(
            F.count("*").alias("total"),
            out("click").alias("stored"),
            out("view").alias("updated"),
            out("error").alias("deleted"),
            out("signup").alias("noop"),
            out("purchase").alias("conflict"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
        .select(
            "job_source", "total", "stored", "updated", "deleted", "noop", "conflict",
            F.round(F.col("noop").cast("double") / F.col("total"), 6).alias("noop_ratio"),
            "sum_k",
        )
        .orderBy("job_source")
    )


# ---------------------------------------------------------------------
# A6: graph/temporal search stats — relative period splits
# ---------------------------------------------------------------------

_A6_NOW = "2024-01-31 00:00:00"

_A6_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN ts >= TIMESTAMP '{_A6_NOW}' - INTERVAL 1 DAY  THEN 1 ELSE 0 END) AS BIGINT) AS last_1d,
       CAST(sum(CASE WHEN ts >= TIMESTAMP '{_A6_NOW}' - INTERVAL 7 DAY  THEN 1 ELSE 0 END) AS BIGINT) AS last_7d,
       CAST(sum(CASE WHEN ts >= TIMESTAMP '{_A6_NOW}' - INTERVAL 30 DAY THEN 1 ELSE 0 END) AS BIGINT) AS last_30d,
       round(CAST(CAST(sum(CASE WHEN ts >= TIMESTAMP '{_A6_NOW}' - INTERVAL 7 DAY
                     THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS DOUBLE) / 100.0, 2) AS value_7d
FROM events
GROUP BY event_type ORDER BY event_type
"""


@register(
    "search_period_stats",
    oracle=_A6_ORACLE,
    doc="Graph/temporal search stats (reference A6, usage_tracker.py:"
    "474-534): one scan, conditional counts for relative 1d/7d/30d "
    "windows (the reference's PERIOD_SQL buckets) plus an exact "
    "fixed-point value sum for the 7d window.",
    tags=("agg", "events"),
)
def search_period_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    now = F.lit(_A6_NOW).cast("timestamp")
    in_window = lambda days: F.col("ts") >= now - F.expr(f"INTERVAL {days} DAY")  # noqa: E731
    bucket = lambda days: F.sum(F.when(in_window(days), 1).otherwise(0)).cast("long")  # noqa: E731
    v7_cents = F.sum(
        F.when(in_window(7), F.round(F.col("value") * 100.0).cast("long")).otherwise(F.lit(0))
    ).cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("total"),
            bucket(1).alias("last_1d"),
            bucket(7).alias("last_7d"),
            bucket(30).alias("last_30d"),
            v7_cents.alias("_v7c"),
        )
        .select(
            "event_type", "total", "last_1d", "last_7d", "last_30d",
            F.round(F.col("_v7c").cast("double") / 100.0, 2).alias("value_7d"),
        )
        .orderBy("event_type")
    )
