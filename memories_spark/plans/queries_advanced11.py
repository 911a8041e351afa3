"""Advanced analytics batch 15: SymSpell-style fuzzy term matching,
incremental rollup maintenance (merge == full recompute), and cohort
LTV curves.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_expr, tokens_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Fuzzy term matching via deletion variants (SymSpell blocking)
# ---------------------------------------------------------------------

_FUZZY_ORACLE = f"""
WITH vocab AS (
  SELECT DISTINCT t AS term
  FROM (SELECT unnest({tokens_sql('text')}) AS t FROM documents)
),
typos AS (
  -- deterministic typo injection: drop the 2nd character of every
  -- vocabulary term of length >= 4 (the query-side misspellings)
  SELECT term AS truth, substr(term, 1, 1) || substr(term, 3) AS typo
  FROM vocab WHERE length(term) >= 4
),
corpus_vars AS (
  SELECT term, term AS variant FROM vocab
  UNION
  SELECT term, substr(term, 1, CAST(i AS INT) - 1) || substr(term, CAST(i AS INT) + 1)
           AS variant
  FROM vocab, LATERAL (SELECT unnest(range(1, length(term) + 1)) AS i)
),
typo_vars AS (
  SELECT typo, truth, typo AS variant FROM typos
  UNION
  SELECT typo, truth, substr(typo, 1, CAST(i AS INT) - 1) || substr(typo, CAST(i AS INT) + 1)
           AS variant
  FROM typos, LATERAL (SELECT unnest(range(1, length(typo) + 1)) AS i)
),
matched AS (
  SELECT DISTINCT t.typo, t.truth, c.term AS matched_term
  FROM typo_vars t JOIN corpus_vars c ON t.variant = c.variant
)
SELECT typo, matched_term,
       CAST(CASE WHEN matched_term = truth THEN 1 ELSE 0 END AS BIGINT)
         AS is_truth
FROM matched
ORDER BY typo, matched_term
"""


@register(
    "fuzzy_term_match",
    oracle=_FUZZY_ORACLE,
    doc="Typo-tolerant term matching via the SymSpell deletion trick: "
    "both the misspelled query terms (vocab terms with their 2nd "
    "character dropped — deterministic injection so matches "
    "verifiably exist) and the corpus vocabulary expand to their "
    "deletion-1 variant sets, and fuzzy match = EQUI-join on the "
    "shared variant — never a levenshtein scan of the vocabulary "
    "per query term. That swap (O(len) variants per term + hash "
    "join vs O(vocab) distance computations) is what makes fuzzy "
    "search feasible on a trillion-token corpus dictionary. The "
    "is_truth flag audits that the intended original is among the "
    "matches (recall witness).",
    tags=("text", "retrieval"),
)
def fuzzy_term_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    vocab = (
        docs.select(F.explode(tokens_expr("text")).alias("term")).distinct()
    )

    def variants(col: str) -> F.Column:
        idx = F.sequence(F.lit(1), F.length(col))
        dels = F.transform(
            idx,
            lambda i: F.concat(
                F.col(col).substr(F.lit(1), i - 1),
                F.col(col).substr(i + 1, F.length(col)),
            ),
        )
        return F.array_distinct(F.concat(F.array(F.col(col)), dels))

    typos = vocab.filter(F.length("term") >= 4).select(
        F.col("term").alias("truth"),
        F.concat(
            F.col("term").substr(1, 1),
            F.col("term").substr(F.lit(3), F.length("term")),
        ).alias("typo"),
    )
    corpus_vars = vocab.select(
        "term", F.explode(variants("term")).alias("variant")
    ).distinct()
    typo_vars = typos.select(
        "typo", "truth", F.explode(variants("typo")).alias("variant")
    ).distinct()
    matched = (
        typo_vars.join(corpus_vars, "variant")
        .select("typo", "truth", F.col("term").alias("matched_term"))
        .distinct()
    )
    return matched.select(
        "typo",
        "matched_term",
        F.when(F.col("matched_term") == F.col("truth"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_truth"),
    ).orderBy("typo", "matched_term")


# ---------------------------------------------------------------------
# Incremental rollup maintenance: base + delta merge == full recompute
# ---------------------------------------------------------------------

_INC_ORACLE = """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS total_value
FROM events
GROUP BY event_type, date_trunc('day', ts)
ORDER BY event_type, day
"""

_CUTOVER = "2024-01-25"


@register(
    "incremental_rollup_merge",
    oracle=_INC_ORACLE,
    doc="Incremental materialized-view maintenance, proven correct: "
    "the daily per-type rollup is computed as BASE (events before "
    f"{_CUTOVER}) and DELTA (events after) rolled up independently "
    "and merged with a full-outer coalesce-sum — and the oracle is "
    "the FULL recompute over all events, so the test pins the "
    "algebraic property the whole lambda/incremental architecture "
    "rests on: fixed-point integer partial aggregates merge "
    "associatively with no drift. At 100 TB this is the difference "
    "between re-scanning history every night and scanning one "
    "day's partition; the same merge runs in the streaming "
    "foreachBatch sinks (KMV, histogram, term stats).",
    tags=("ops", "temporal"),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    cut = F.lit(_CUTOVER).cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("cents"),
        )

    base = rollup(ev.filter(F.col("ts") < cut))
    delta = rollup(ev.filter(F.col("ts") >= cut))
    b = base.select(
        "event_type", "day", F.col("n").alias("bn"), F.col("cents").alias("bc")
    )
    d = delta.select(
        "event_type", "day", F.col("n").alias("dn"), F.col("cents").alias("dc")
    )
    merged = b.join(d, ["event_type", "day"], "full_outer").select(
        "event_type",
        "day",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias("cents"),
    )
    return merged.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("total_value"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------
# Cohort LTV curve (revenue by signup cohort x week age)
# ---------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts))) AS BIGINT) // 604800 AS cohort_wk
  FROM events GROUP BY user_id
),
purchases AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT f.cohort_wk - 2817 AS cohort_week,
       p.wk - f.cohort_wk AS week_age,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS buyers,
       round(CAST(sum(p.cents) AS DOUBLE) / 100.0, 2) AS revenue
FROM purchases p JOIN firsts f ON p.user_id = f.user_id
GROUP BY f.cohort_wk, p.wk
ORDER BY cohort_week, week_age
"""


@register(
    "cohort_ltv_curve",
    oracle=_LTV_ORACLE,
    doc="Cohort lifetime-value curve: users cohorted by the epoch week "
    "of their first event, purchase revenue attributed to (cohort, "
    "week-age) cells — the money-weighted generalization of "
    "weekly_retention_cohorts (which counts activity, not value). "
    "Cohort week is rebased to a small integer for readability. "
    "One groupBy finds first-touch weeks, the purchase stream "
    "joins it on user_id (broadcast at dim-scale, shuffle at "
    "fact-scale — Catalyst picks), revenue sums are exact cents. "
    "The LTV table is what a marketing-spend model trains on.",
    tags=("product", "temporal"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    wk = lambda c: (F.unix_timestamp(c) / F.lit(604800)).cast("long")  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        (F.unix_timestamp(F.min("ts")) / F.lit(604800))
        .cast("long")
        .alias("cohort_wk")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        wk(F.col("ts")).alias("wk"),
        F.round(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    return (
        purchases.join(firsts, "user_id")
        .groupBy("cohort_wk", "wk")
        .agg(
            F.countDistinct("user_id").alias("buyers"),
            F.round(F.sum("cents").cast("double") / 100.0, 2).alias("revenue"),
        )
        .select(
            (F.col("cohort_wk") - 2817).alias("cohort_week"),
            (F.col("wk") - F.col("cohort_wk")).alias("week_age"),
            "buyers",
            "revenue",
        )
        .orderBy("cohort_week", "week_age")
    )
