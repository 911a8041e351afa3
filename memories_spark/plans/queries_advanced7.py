"""Advanced analytics batch 11: Holt double-exponential smoothing via
grouped applyInPandas (the sequential-recurrence case Spark windows
cannot express), and the first BPE merge decision over the corpus.

Determinism notes: Holt runs with alpha = beta = 0.5 on integer
cents, so every level/trend value is a dyadic rational representable
exactly in IEEE doubles — Python, Spark and DuckDB's recursive CTE
compute bit-identical sequences. BPE pair counts are pure BIGINTs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.texttools import bounded_seq, tokens_sql, tokens_expr
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Holt double-exponential smoothing per user (level + trend)
# ---------------------------------------------------------------------

_HOLT_N = 20  # first N events per user — bounded state per group

_HOLT_ORACLE = f"""
WITH RECURSIVE ranked AS (
  SELECT user_id,
         CAST(round(value * 100.0) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  QUALIFY rn <= {_HOLT_N}
),
s AS (
  SELECT user_id, 1 AS k,
         CAST(y AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.user_id, s.k + 1,
         0.5 * r.y + 0.5 * (s.level + s.trend),
         0.5 * ((0.5 * r.y + 0.5 * (s.level + s.trend)) - s.level)
           + 0.5 * s.trend
  FROM s JOIN ranked r ON r.user_id = s.user_id AND r.rn = s.k + 1
),
last AS (
  SELECT user_id, max(k) AS n_events FROM s GROUP BY user_id
)
SELECT l.user_id, CAST(l.n_events AS BIGINT) AS n_events,
       round(s.level / 100.0, 6) AS level,
       round(s.trend / 100.0, 6) AS trend,
       round((s.level + s.trend) / 100.0, 6) AS forecast_next
FROM last l JOIN s ON s.user_id = l.user_id AND s.k = l.n_events
ORDER BY l.user_id
"""


@register(
    "holt_user_forecast",
    oracle=_HOLT_ORACLE,
    doc="Holt double-exponential smoothing (level + trend, alpha = "
    "beta = 0.5) over each user's first 20 event values, with the "
    "one-step-ahead forecast — the coupled recurrence that EWMA's "
    "closed form cannot absorb (trend feeds back into level), so "
    "this is the repo's canonical GROUPED applyInPandas operator: "
    "Arrow-batched per-group pandas compute, state bounded at 20 "
    "rows per user, one user_id shuffle. Dyadic coefficients on "
    "integer cents keep every intermediate exactly representable, "
    "so the pandas loop, Spark, and DuckDB's recursive CTE agree "
    "bit-for-bit — the oracle actually replays the recursion. At "
    "scale this is the pattern for any per-entity sequential model "
    "(HMM decode, Kalman step, session replay).",
    tags=("temporal", "stats", "udf"),
)
def holt_user_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100.0).cast("long").alias("y"),
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"]).head(_HOLT_N)
        ys = pdf["y"].tolist()
        level, trend = float(ys[0]), 0.0
        for y in ys[1:]:
            new_level = 0.5 * y + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(ys)],
                "level_c": [level],
                "trend_c": [trend],
            }
        )

    out = base.groupBy("user_id").applyInPandas(
        holt, "user_id long, n_events long, level_c double, trend_c double"
    )
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("level_c") / 100.0, 6).alias("level"),
        F.round(F.col("trend_c") / 100.0, 6).alias("trend"),
        F.round((F.col("level_c") + F.col("trend_c")) / 100.0, 6).alias(
            "forecast_next"
        ),
    ).orderBy("user_id")


# ---------------------------------------------------------------------
# First BPE merge decision (most frequent adjacent symbol pairs)
# ---------------------------------------------------------------------

_BPE_ORACLE = f"""
WITH words AS (
  SELECT t AS w, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({tokens_sql('text')}) AS t FROM documents)
  GROUP BY t
),
pairs AS (
  SELECT unnest(list_transform(range(1, greatest(length(w) - 1, 0) + 1),
                               i -> substr(w, CAST(i AS INT), 2))) AS pair,
         wc
  FROM words
),
agg AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS n
  FROM pairs GROUP BY pair
)
SELECT pair, n FROM agg
ORDER BY n DESC, pair ASC
LIMIT 10
"""


@register(
    "bpe_first_merges",
    oracle=_BPE_ORACLE,
    doc="The first BPE merge decision: frequency of every adjacent "
    "character pair across the corpus, weighted by word occurrence "
    "count — the argmax pair is what a byte-pair-encoding "
    "tokenizer trainer would merge first (Sennrich et al.'s "
    "algorithm, step 1). The word-level pre-aggregation is the "
    "scale trick: pair explosion runs over the (tiny) distinct "
    "vocabulary with counts attached, not over every token "
    "instance — at 100 TB the vocab table is millions of rows "
    "while the token stream is trillions. Top-10 via "
    "TakeOrderedAndProject.",
    tags=("text", "training"),
)
def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    words = (
        docs.select(F.explode(tokens_expr("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    # bounded_seq: 1-char words emit ZERO pairs (the raw sequence(1,0)
    # idiom emitted [1,0] -> two copies of the word itself, silently
    # double-weighting single-letter "pairs" in the merge table)
    idx = bounded_seq(F.length("w") - 1)
    pairs = words.select(
        F.explode(
            F.transform(idx, lambda i: F.col("w").substr(i, F.lit(2)))
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(10)
    )
