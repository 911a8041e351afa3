"""Advanced analytics batch 18: equi-depth range-partition
boundaries, sessionized bounce rate, and time-decayed term trends.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_expr, tokens_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Equi-depth range-partition boundaries (the repartitionByRange query)
# ---------------------------------------------------------------------

_NBUCKETS = 8

_RANGEPART_ORACLE = f"""
WITH vals AS (
  SELECT CAST(round(value * 100.0) AS BIGINT) AS cents FROM events
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
dv AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY cents),
cum AS (
  SELECT cents, c,
         sum(c) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM dv
),
bounds AS (
  SELECT b.b AS bucket,
         (SELECT min(cents) FROM cum, tot
          WHERE cc * {_NBUCKETS} >= CAST(n AS BIGINT) * b.b) AS hi_cents
  FROM (SELECT unnest(generate_series(1, {_NBUCKETS})) AS b) b
),
counts AS (
  SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_rows
  FROM vals v JOIN bounds b
    ON v.cents <= b.hi_cents
   AND (b.bucket = 1 OR v.cents >
        (SELECT hi_cents FROM bounds p WHERE p.bucket = b.bucket - 1))
  GROUP BY b.bucket
)
SELECT c.bucket AS bucket,
       round(CAST(b.hi_cents AS DOUBLE) / 100.0, 2) AS upper_bound,
       c.n_rows
FROM counts c JOIN bounds b ON b.bucket = c.bucket
ORDER BY bucket
"""


@register(
    "range_partition_boundaries",
    oracle=_RANGEPART_ORACLE,
    doc="Equi-depth range-partition planning: the 8 nearest-rank "
    "octile boundaries of the value column plus the actual row "
    "count landing in each range — exactly the split-point "
    "computation behind repartitionByRange / range-bucketed "
    "writes (Spark samples for these; this query computes them "
    "EXACTLY, with integer rank comparisons cc*8 >= n*b so no "
    "float percentile enters the cut). The per-bucket counts "
    "audit balance: a skewed column shows up immediately as "
    "unequal n_rows, which is the signal to salt or to split "
    "hot boundaries. Cumulative window runs over DISTINCT cents "
    "values; the boundary table (8 rows) broadcasts back for the "
    "counting join.",
    tags=("ops", "stats"),
)
def range_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    vals = ev.select(F.round(F.col("value") * 100.0).cast("long").alias("cents"))
    tot = vals.agg(F.count("*").alias("n"))
    dv = vals.groupBy("cents").agg(F.count("*").alias("c"))
    cum = dv.select(
        "cents",
        F.sum("c")
        .over(Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cc"),
    )
    buckets = spark.range(1, _NBUCKETS + 1).select(
        F.col("id").cast("long").alias("bucket")
    )
    bounds = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(buckets))
        .filter(F.col("cc") * _NBUCKETS >= F.col("n") * F.col("bucket"))
        .groupBy("bucket")
        .agg(F.min("cents").alias("hi_cents"))
    )
    w_prev = Window.orderBy("bucket")
    bounds_with_lo = bounds.select(
        "bucket",
        "hi_cents",
        F.lag("hi_cents").over(w_prev).alias("lo_cents"),
    )
    counts = (
        vals.crossJoin(F.broadcast(bounds_with_lo))
        .filter(
            (F.col("cents") <= F.col("hi_cents"))
            & (F.col("lo_cents").isNull() | (F.col("cents") > F.col("lo_cents")))
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"))
    )
    return (
        counts.join(F.broadcast(bounds), "bucket")
        .select(
            "bucket",
            F.round(F.col("hi_cents").cast("double") / 100.0, 2).alias(
                "upper_bound"
            ),
            "n_rows",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------
# Session bounce rate (30-minute gap sessions)
# ---------------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
               OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, event_id, event_type, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ordered
),
per_sess AS (
  SELECT user_id, sid,
         CAST(count(*) AS BIGINT) AS n_events,
         min(ts) AS t0
  FROM sess GROUP BY user_id, sid
),
first_ev AS (
  SELECT s.user_id, s.sid, s.event_type AS entry_type, p.n_events
  FROM sess s JOIN per_sess p
    ON s.user_id = p.user_id AND s.sid = p.sid AND s.ts = p.t0
  QUALIFY row_number() OVER (PARTITION BY s.user_id, s.sid
                             ORDER BY s.event_id) = 1
)
SELECT entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS bounce_rate
FROM first_ev
GROUP BY entry_type
ORDER BY entry_type
"""


@register(
    "session_bounce_rate",
    oracle=_BOUNCE_ORACLE,
    doc="Bounce rate by session entry type: 30-minute-gap sessions "
    "(the sessionize_events definition), a session bounces if it "
    "contains exactly one event, grouped by the type of its FIRST "
    "event — the landing-page quality metric. Session assembly is "
    "the standard lag+cumsum pair on ONE user_id shuffle; the "
    "per-session rollup and first-event pick reuse that same "
    "partitioning (first event via min-ts join + row_number "
    "tie-break on event_id, deterministic under simultaneous "
    "events).",
    tags=("product", "temporal"),
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_ord)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id", "event_id", "event_type", "ts", new_s.alias("new_s")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum("new_s")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"), F.min("ts").alias("t0")
    )
    first_ev = (
        sess.join(
            per_sess,
            ["user_id", "sid"],
        )
        .filter(F.col("ts") == F.col("t0"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "sid").orderBy("event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("event_type").alias("entry_type"), "n_events")
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        first_ev.groupBy("entry_type")
        .agg(
            F.count("*").alias("n_sessions"),
            bounce.alias("n_bounces"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_bounces",
            F.round(
                F.col("n_bounces").cast("double") / F.col("n_sessions"), 6
            ).alias("bounce_rate"),
        )
        .orderBy("entry_type")
    )


# ---------------------------------------------------------------------
# Time-decayed term trends (recency-weighted heavy hitters)
# ---------------------------------------------------------------------

_DECAY_TREND_ORACLE = f"""
WITH docs_t AS (
  -- deterministic per-doc virtual timestamp: doc_id minutes after
  -- 2024-01-01 (documents carry no timestamp column)
  SELECT doc_id, {tokens_sql('text')} AS toks,
         1704067200 + doc_id * 60 AS t_s
  FROM documents
),
horizon AS (SELECT max(t_s) AS now_s FROM docs_t),
toks AS (
  SELECT t AS term,
         CAST(round(power(0.5,
           CAST(h.now_s - d.t_s AS DOUBLE) / 604800.0) * 1e12) AS BIGINT)
           AS w_fp
  FROM docs_t d, horizon h, unnest(d.toks) AS u(t)
)
SELECT term,
       CAST(count(*) AS BIGINT) AS raw_count,
       round(CAST(sum(w_fp) AS DOUBLE) / 1e12, 6) AS decayed_count
FROM toks
GROUP BY term
ORDER BY sum(w_fp) DESC, term ASC
LIMIT 15
"""


@register(
    "decayed_term_trends",
    oracle=_DECAY_TREND_ORACLE,
    doc="Recency-weighted heavy hitters: term counts where each "
    "occurrence contributes 0.5^(age/7d) instead of 1 — the "
    "trending-topics ranking (a term spiking THIS week beats a "
    "historically common one), the decay analogue of "
    "weekly_top_props' discrete windows. Documents get a "
    "deterministic virtual timestamp (doc_id minutes after "
    "2024-01-01) since the synthetic corpus has none. Each decay "
    "weight is frozen to fixed-point BEFORE the sum (the same "
    "discipline as multi_touch_attribution), so the ranking is "
    "aggregation-order-independent; the groupBy is "
    "map-side-combinable with O(vocab) state.",
    tags=("text", "temporal", "training"),
)
def decayed_term_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    docs_t = docs.select(
        "doc_id",
        tokens_expr("text").alias("toks"),
        (F.lit(1704067200) + F.col("doc_id") * 60).alias("t_s"),
    )
    horizon = docs_t.agg(F.max("t_s").alias("now_s"))
    toks = (
        docs_t.crossJoin(F.broadcast(horizon))
        .select(
            F.explode("toks").alias("term"),
            F.round(
                F.pow(
                    F.lit(0.5),
                    (F.col("now_s") - F.col("t_s")).cast("double")
                    / F.lit(604800.0),
                )
                * F.lit(1e12)
            )
            .cast("long")
            .alias("w_fp"),
        )
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("raw_count"),
            F.sum("w_fp").alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("term").asc())
        .limit(15)
        .select(
            "term",
            "raw_count",
            F.round(F.col("s").cast("double") / F.lit(1e12), 6).alias(
                "decayed_count"
            ),
        )
    )
