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
