"""Advanced analytics batch 27: calendar streaks (gaps-and-islands),
prequential online-mean evaluation, and per-group weighted sampling.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import hex_frac_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Longest consecutive-active-day streak per user (gaps and islands)
# ---------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
  FROM events
),
ranked AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
         CAST(min(d) AS BIGINT) AS start_d
  FROM ranked GROUP BY user_id, grp
),
best AS (
  SELECT user_id, len, start_d,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_d ASC) AS rk
  FROM streaks
)
SELECT user_id, len AS longest_streak_days,
       strftime(make_timestamp(start_d * 86400 * 1000000), '%Y-%m-%d')
         AS streak_start
FROM best WHERE rk = 1
ORDER BY user_id
"""


@register(
    "longest_active_streak",
    oracle=_STREAK_ORACLE,
    doc="Longest consecutive-active-day streak per user via the "
    "canonical gaps-and-islands identity: on the DISTINCT (user, "
    "day) table, day minus its per-user row_number is constant "
    "exactly within a run of consecutive days, so runs collapse "
    "with one groupBy on that difference — no self-join, no "
    "recursion, two window passes on one user_id shuffle. Ties "
    "(equal-length streaks) resolve to the earliest start. The "
    "engagement-streak metric every retention team tracks, and "
    "the textbook island pattern the relational inventory was "
    "missing.",
    tags=("temporal", "product"),
)
def longest_active_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    days = ev.select(
        "user_id",
        (F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = days.select(
        "user_id", "d", (F.col("d") - F.row_number().over(w)).alias("grp")
    )
    streaks = ranked.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("d").alias("start_d")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start_d").asc()
    )
    best = streaks.withColumn("rk", F.row_number().over(wb)).filter(
        F.col("rk") == 1
    )
    return best.select(
        "user_id",
        F.col("len").alias("longest_streak_days"),
        F.date_format(
            F.timestamp_seconds(F.col("start_d") * 86400), "yyyy-MM-dd"
        ).alias("streak_start"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------
# Prequential (test-then-train) running-mean evaluation
# ---------------------------------------------------------------------

_PREQ_ORACLE = """
WITH seq AS (
  SELECT event_type,
         CAST(round(value * 100.0) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS k,
         COALESCE(sum(CAST(round(value * 100.0) AS BIGINT)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM events
),
errs AS (
  SELECT event_type,
         CAST(round(abs(CAST(v * (k - 1) - cum_prev AS DOUBLE) / (k - 1))
                    * 1e6) AS BIGINT) AS err_fp
  FROM seq WHERE k > 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       round(CAST(sum(err_fp) AS DOUBLE) / count(*) / 1e6 / 100.0, 6)
         AS prequential_mae
FROM errs
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "prequential_mean_error",
    oracle=_PREQ_ORACLE,
    doc="Prequential (test-then-train) evaluation of the simplest "
    "online predictor: each event's value is predicted by the "
    "running mean of all PRIOR values of its type, and the mean "
    "absolute error is the model's honest streaming loss — the "
    "evaluation protocol online-learning systems report (every "
    "point is scored before it trains). The per-row error "
    "|v*(k-1) - cum_prev| / (k-1) keeps the numerator an exact "
    "BIGINT (no float mean is ever formed) and freezes each "
    "error to fixed point before the sum. One window pass per "
    "type; the baseline any fancier forecaster must beat.",
    tags=("stats", "temporal"),
)
def prequential_mean_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100.0).cast("long")
    seq = ev.select(
        "event_type",
        v.alias("v"),
        F.row_number().over(w).alias("k"),
        F.coalesce(
            F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_prev"),
    )
    errs = seq.filter(F.col("k") > 1).select(
        "event_type",
        F.round(
            F.abs(
                (F.col("v") * (F.col("k") - 1) - F.col("cum_prev")).cast(
                    "double"
                )
                / (F.col("k") - 1)
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("err_fp"),
    )
    return (
        errs.groupBy("event_type")
        .agg(F.count("*").alias("n_scored"), F.sum("err_fp").alias("s"))
        .select(
            "event_type",
            "n_scored",
            F.round(
                F.col("s").cast("double")
                / F.col("n_scored")
                / F.lit(1e6)
                / F.lit(100.0),
                6,
            ).alias("prequential_mae"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Per-group weighted sampling without replacement (grouped A-Res)
# ---------------------------------------------------------------------

_GROUP_K = 3

_GARES_U = hex_frac_sql("md5('gares:' || CAST(doc_id AS VARCHAR))")

_GARES_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         -ln({_GARES_U}) / n_chars AS akey
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY akey ASC, doc_id ASC)
           AS rk
  FROM keyed
)
SELECT source, CAST(rk AS BIGINT) AS rank, doc_id, n_chars
FROM ranked WHERE rk <= {_GROUP_K}
ORDER BY source, rank
"""


@register(
    "groupwise_weighted_sample",
    oracle=_GARES_ORACLE,
    doc="Per-group weighted sampling without replacement: within each "
    "source, the 3 documents with the smallest Efraimidis-Spirakis "
    "exponential keys -ln(u)/w (w = n_chars, u from a seeded md5) "
    "form an exact size-weighted sample — the grouped counterpart "
    "of weighted_sample_ares (global) and the primitive behind "
    "'take a proportional sample from EVERY source' "
    "(budget_allocation_largest_remainder decides how many; this "
    "decides WHICH). One partitioned window, compiled to "
    "WindowGroupLimit, zero extra shuffles beyond the source "
    "partitioning; identical sample on every engine and every "
    "run.",
    tags=("training", "sampling"),
)
def groupwise_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    u = F.expr(hex_frac_sql("md5('gares:' || CAST(doc_id AS STRING))"))
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "source",
        "doc_id",
        "n_chars",
        (-F.log(u) / F.col("n_chars")).alias("akey"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("akey").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _GROUP_K)
        .select("source", F.col("rank").cast("long").alias("rank"), "doc_id", "n_chars")
        .orderBy("source", "rank")
    )
