"""Advanced analytics batch 16: calendar-aware business-hours
aggregation, keyword-in-context concordance, and largest-remainder
budget allocation.

Determinism contract as per the registry module docstring. Day-of-week
is computed from raw epoch-day arithmetic ((days+4)%7, 0=Sunday) so
neither engine's dow() convention (Spark 1=Sunday, DuckDB 0=Sunday)
ever enters the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_expr, tokens_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Business-hours share per event type
# ---------------------------------------------------------------------

_BIZ_ORACLE = """
WITH flagged AS (
  SELECT event_type,
         CASE WHEN ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7)
                   BETWEEN 1 AND 5
               AND ((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600)
                   BETWEEN 9 AND 16
              THEN 1 ELSE 0 END AS biz
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(biz) AS BIGINT) AS n_business,
       round(CAST(sum(biz) AS DOUBLE) / count(*), 6) AS business_share
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "business_hours_share",
    oracle=_BIZ_ORACLE,
    doc="Calendar-aware aggregation: the share of each event type "
    "falling in business hours (Mon-Fri 09:00-16:59 UTC). "
    "Day-of-week derives from pure epoch arithmetic ((epoch_day + "
    "4) % 7 — 1970-01-01 was a Thursday) instead of either "
    "engine's dow() builtin, sidestepping the classic 0=Sunday vs "
    "1=Sunday cross-engine bug; the hour comes from epoch mod "
    "86400 for the same reason. One conditional-sum aggregation "
    "pass, fully codegen.",
    tags=("temporal", "stats"),
)
def business_hours_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    es = F.unix_timestamp("ts")
    dow = ((es / F.lit(86400)).cast("long") + 4) % 7
    hour = ((es % 86400) / F.lit(3600)).cast("long")
    biz = F.when(
        dow.between(1, 5) & hour.between(9, 16), 1
    ).otherwise(0)
    return (
        ev.select("event_type", biz.alias("biz"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("biz").alias("n_business"),
        )
        .select(
            "event_type",
            "n_total",
            "n_business",
            F.round(
                F.col("n_business").cast("double") / F.col("n_total"), 6
            ).alias("business_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Keyword-in-context (KWIC) concordance
# ---------------------------------------------------------------------

_KWIC_ORACLE = f"""
WITH toked AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
freq AS (
  SELECT t AS term, count(*) AS tf
  FROM (SELECT unnest(toks) AS t FROM toked)
  GROUP BY t
),
kw AS (
  SELECT term FROM freq ORDER BY tf DESC, term ASC LIMIT 1
),
hits AS (
  SELECT d.doc_id, CAST(list_position(d.toks, k.term) AS BIGINT) AS pos,
         d.toks
  FROM toked d, kw k
  WHERE list_position(d.toks, k.term) IS NOT NULL
    AND list_position(d.toks, k.term) > 0
)
SELECT doc_id, pos,
       array_to_string(
         toks[CAST(greatest(1, pos - 3) AS BIGINT):
              CAST(least(len(toks), pos + 3) AS BIGINT)], ' ') AS context
FROM hits
ORDER BY doc_id
LIMIT 30
"""


@register(
    "keyword_concordance",
    oracle=_KWIC_ORACLE,
    doc="Keyword-in-context concordance: the corpus's most frequent "
    "term (deterministic argmax: tf desc, term asc), located in "
    "each document at its FIRST occurrence (array_position), shown "
    "with a +/-3-token context window — the corpus-linguistics "
    "view a search UI renders under each hit, and the debug tool "
    "for tokenizer/quality work. The keyword is a 1-row broadcast "
    "from the term-frequency rollup; context slicing is pure "
    "array codegen on rows that contain the hit (clamped at both "
    "ends); no token-level explode ever reaches the output path.",
    tags=("text", "retrieval"),
)
def keyword_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", tokens_expr("text").alias("toks"))
    freq = (
        toked.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    kw = (
        freq.orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(1)
        .select("term")
    )
    hits = (
        toked.crossJoin(F.broadcast(kw))
        .select(
            "doc_id",
            "toks",
            F.array_position("toks", F.col("term")).alias("pos"),
        )
        .filter(F.col("pos") > 0)
    )
    start = F.greatest(F.lit(1), F.col("pos") - 3)
    length = F.least(F.size("toks"), F.col("pos") + 3) - start + 1
    return (
        hits.select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.concat_ws(" ", F.slice("toks", start, length)).alias("context"),
        )
        .orderBy("doc_id")
        .limit(30)
    )


# ---------------------------------------------------------------------
# Largest-remainder budget allocation across sources
# ---------------------------------------------------------------------

_BUDGET = 100

_ALLOC_ORACLE = f"""
WITH w AS (
  SELECT string_split(source, '/')[1] AS src,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS weight
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum,
               CAST(count(*) AS BIGINT) AS n_src FROM w),
base AS (
  SELECT w.src, w.weight,
         ({_BUDGET} * w.weight) // t.wsum AS floor_q,
         ({_BUDGET} * w.weight) % t.wsum AS rem,
         t.wsum
  FROM w, tot t
),
short AS (
  SELECT CAST({_BUDGET} - sum(floor_q) AS BIGINT) AS k FROM base
),
ranked AS (
  SELECT src, weight, floor_q,
         row_number() OVER (ORDER BY rem DESC, src ASC) AS rk
  FROM base
)
SELECT r.src, r.weight,
       CAST(r.floor_q + CASE WHEN r.rk <= s.k THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM ranked r, short s
ORDER BY r.src
"""


@register(
    "budget_allocation_largest_remainder",
    oracle=_ALLOC_ORACLE,
    doc=f"Largest-remainder (Hamilton) apportionment: a global budget "
    f"of {_BUDGET} sampling slots split across source folders "
    "proportionally to their token counts — floor quotas first, "
    "then the leftover slots go to the largest fractional "
    "remainders (ties by source name). This is the deterministic "
    "integer answer to 'sample N documents proportionally to "
    "source size' that naive float rounding gets wrong (quotas "
    "that don't sum to N); mixture_weighted_sample uses "
    "per-source budgets exactly like these. All math is BIGINT "
    "(100*w // W and the modulus), the remainder rank runs over "
    "sources-count rows.",
    tags=("training", "sampling"),
)
def budget_allocation_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    w = docs.select(
        F.split(F.col("source"), "/").getItem(0).alias("src"),
        F.size(F.split(F.col("text"), " ")).alias("ntok"),
    ).groupBy("src").agg(F.sum("ntok").alias("weight"))
    tot = w.agg(F.sum("weight").alias("wsum"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "src",
        "weight",
        F.expr(f"{_BUDGET} * weight DIV wsum").alias("floor_q"),
        (F.lit(_BUDGET) * F.col("weight") % F.col("wsum")).alias("rem"),
    )
    short = base.agg((F.lit(_BUDGET) - F.sum("floor_q")).alias("k"))
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("src").asc())
    )
    ranked = base.select("src", "weight", "floor_q", rk.alias("rk"))
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "src",
            "weight",
            (
                F.col("floor_q")
                + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
        .orderBy("src")
    )
