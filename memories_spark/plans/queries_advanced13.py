"""Advanced analytics batch 17: A/B test proportions, Kaplan-Meier
survival estimation, and peak concurrency via two-phase prefix sums.

Determinism contract as per the registry module docstring. The KM
curve freezes each ln(1 - d/n) term to fixed-point before the
cumulative sum, so the product-limit estimator is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# A/B test: two-proportion z-test over hash-split users
# ---------------------------------------------------------------------

_AB_ORACLE = """
WITH users AS (
  SELECT user_id,
         CASE WHEN CAST(concat('0x',
                substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 2))
                AS INTEGER) < 128
              THEN 'A' ELSE 'B' END AS grp,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
g AS (
  SELECT
    CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN grp = 'A' THEN converted ELSE 0 END) AS BIGINT) AS c_a,
    CAST(sum(CASE WHEN grp = 'B' THEN converted ELSE 0 END) AS BIGINT) AS c_b
  FROM users
)
SELECT n_a, n_b, c_a, c_b,
       round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
            ELSE round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) END AS z_score
FROM g
"""


@register(
    "ab_test_proportions",
    oracle=_AB_ORACLE,
    doc="A/B experiment readout: users hash-split 50/50 (md5 bucket — "
    "the same deterministic assignment dataset_split_assignment "
    "uses, so a user's arm is recomputable anywhere), conversion "
    "= any purchase, and the two-proportion pooled z-test "
    "statistic computed from exact BIGINT counts (floats appear "
    "only in the final closed-form expression, identically "
    "parenthesized in both engines). The per-user collapse is one "
    "conditional-max groupBy; the readout is a 1-row rollup. "
    "This is the experimentation primitive every growth pipeline "
    "reruns nightly at fact-table scale.",
    tags=("product", "stats"),
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 2
        ),
        16,
        10,
    ).cast("int")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(bucket < 128, "A").otherwise("B").alias("grp"), "converted"
    )
    g = users.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == "A", F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("grp") == "B", F.col("converted")).otherwise(0)).alias("c_b"),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    conv = F.col("c_a") + F.col("c_b")
    degenerate = (conv == 0) | (conv == F.col("n_a") + F.col("n_b"))
    return g.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.when(degenerate, F.lit(0.0)).otherwise(F.round(z, 6)).alias("z_score"),
    )


# ---------------------------------------------------------------------
# Kaplan-Meier survival: time from first view to first purchase
# ---------------------------------------------------------------------

_KM_HORIZON = 604800  # censor at 7 days

_KM_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY user_id
),
durs AS (
  SELECT CASE WHEN fp IS NOT NULL
               AND floor(epoch(fp)) - floor(epoch(fv)) > 0
               AND floor(epoch(fp)) - floor(epoch(fv)) <= {_KM_HORIZON}
              THEN CAST(floor(epoch(fp)) - floor(epoch(fv)) AS BIGINT)
              ELSE {_KM_HORIZON} END AS dur,
         CASE WHEN fp IS NOT NULL
               AND floor(epoch(fp)) - floor(epoch(fv)) > 0
               AND floor(epoch(fp)) - floor(epoch(fv)) <= {_KM_HORIZON}
              THEN 1 ELSE 0 END AS ev
  FROM firsts WHERE fv IS NOT NULL
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM durs),
by_t AS (
  SELECT dur, CAST(sum(ev) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS c
  FROM durs GROUP BY dur
),
cum AS (
  SELECT dur, d, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS before_t
  FROM by_t
),
terms AS (
  SELECT c.dur, c.d, t.n - c.before_t AS n_risk,
         CASE WHEN c.d > 0 AND t.n - c.before_t > c.d
              THEN CAST(round(ln(CAST(t.n - c.before_t - c.d AS DOUBLE)
                                 / (t.n - c.before_t)) * 1e12) AS BIGINT)
              ELSE 0 END AS lnterm_fp,
         CASE WHEN t.n - c.before_t <= c.d AND c.d > 0 THEN 1 ELSE 0 END
           AS dies_out
  FROM cum c, tot t
),
surv AS (
  SELECT dur, d, n_risk,
         sum(lnterm_fp) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln,
         max(dies_out) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
  FROM terms
)
SELECT dur AS t_seconds, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d_events,
       CASE WHEN dead = 1 THEN 0.0
            ELSE round(exp(CAST(cum_ln AS DOUBLE) / 1e12), 6) END AS survival
FROM surv
WHERE d > 0
ORDER BY t_seconds
LIMIT 50
"""


@register(
    "kaplan_meier_second_event",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier product-limit survival curve for time from "
    "first view to first purchase, right-censored at 7 days — the "
    "statistically correct way to report time-to-convert when "
    "most users have NOT converted yet (naive mean-of-converters "
    "is survivorship-biased; conversion_latency_percentiles only "
    "describes the converters). The risk set n(t) comes from one "
    "cumulative window over DISTINCT durations; each factor "
    "(1 - d/n) enters as a fixed-point ln so the running product "
    "is an integer cumsum (order-independent), exponentiated only "
    "at output. Everything after the per-user collapse runs on "
    "distinct-duration rows.",
    tags=("product", "stats", "temporal"),
)
def kaplan_meier_second_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    gap = F.unix_timestamp("fp") - F.unix_timestamp("fv")
    is_event = (
        F.col("fp").isNotNull() & (gap > 0) & (gap <= _KM_HORIZON)
    )
    durs = firsts.filter(F.col("fv").isNotNull()).select(
        F.when(is_event, gap).otherwise(F.lit(_KM_HORIZON)).alias("dur"),
        F.when(is_event, 1).otherwise(0).alias("ev"),
    )
    tot = durs.agg(F.count("*").alias("n"))
    by_t = durs.groupBy("dur").agg(
        F.sum("ev").alias("d"), F.count("*").alias("c")
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_t.select(
        "dur",
        "d",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).alias("before_t"),
    )
    n_risk = F.col("n") - F.col("before_t")
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        n_risk.alias("n_risk"),
        F.when(
            (F.col("d") > 0) & (n_risk > F.col("d")),
            F.round(
                F.log((n_risk - F.col("d")).cast("double") / n_risk)
                * F.lit(1e12)
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("lnterm_fp"),
        F.when((n_risk <= F.col("d")) & (F.col("d") > 0), 1)
        .otherwise(0)
        .alias("dies_out"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    surv = terms.select(
        "dur",
        "d",
        "n_risk",
        F.sum("lnterm_fp").over(w_cum).alias("cum_ln"),
        F.max("dies_out").over(w_cum).alias("dead"),
    )
    return (
        surv.filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("t_seconds"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("d_events"),
            F.when(F.col("dead") == 1, F.lit(0.0))
            .otherwise(
                F.round(F.exp(F.col("cum_ln").cast("double") / F.lit(1e12)), 6)
            )
            .alias("survival"),
        )
        .orderBy("t_seconds")
        .limit(50)
    )


# ---------------------------------------------------------------------
# Peak concurrency via two-phase prefix sums (scale-safe sweep)
# ---------------------------------------------------------------------

_PEAK_ORACLE = """
WITH iv AS (
  SELECT event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + (abs(CAST(round(value * 100.0) AS BIGINT)) % 1741) + 60 AS e
  FROM events
),
pts AS (
  SELECT s AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT e AS t, -1 AS delta, event_id FROM iv
),
swept AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM pts
),
mx AS (SELECT max(cum) AS peak FROM swept)
SELECT CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_intervals,
       CAST(m.peak AS BIGINT) AS peak_concurrency,
       CAST((SELECT min(t) FROM swept WHERE cum = m.peak) AS BIGINT)
         AS peak_at_s
FROM mx m
"""


@register(
    "peak_concurrency",
    oracle=_PEAK_ORACLE,
    doc="Peak concurrency (max simultaneous open intervals, closed- "
    "open semantics: an interval ending at t frees its slot to "
    "one starting at t): the +1/-1 endpoint sweep, implemented "
    "scale-safely as TWO-PHASE prefix sums — endpoints bucket by "
    "hour, the running sum within each bucket is a per-bucket "
    "window (parallel across buckets), and bucket offsets come "
    "from one tiny cumulative window over per-bucket deltas, so "
    "no single task ever sorts the full endpoint stream the way a "
    "naive global-ORDER-BY cumsum would. The oracle uses the "
    "textbook single global sweep — same answer, which is the "
    "point: the decomposition is exact, not approximate.",
    tags=("temporal", "ops"),
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    start = F.unix_timestamp("ts")
    dur = (F.abs(F.round(F.col("value") * 100.0).cast("long")) % 1741) + 60
    iv = ev.select(
        "event_id", start.alias("s"), (start + dur).alias("e")
    )
    pts = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id")
    )
    pts = pts.withColumn("bucket", (F.col("t") / F.lit(3600)).cast("long"))
    # phase 1: running sum WITHIN each hour bucket (parallel)
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = pts.withColumn("cum_in", F.sum("delta").over(w_in))
    # phase 2: per-bucket totals -> exclusive running offset (tiny)
    totals = pts.groupBy("bucket").agg(F.sum("delta").alias("btotal"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("btotal").over(w_off), F.lit(0)).alias("offset"),
    )
    swept = within.join(F.broadcast(offsets), "bucket").select(
        "t", (F.col("cum_in") + F.col("offset")).alias("cum")
    )
    mx = swept.agg(F.max("cum").alias("peak"))
    n = iv.agg(F.count("*").alias("n_intervals"))
    at = (
        swept.join(F.broadcast(mx), F.col("cum") == F.col("peak"))
        .agg(F.min("t").alias("peak_at_s"))
    )
    return (
        n.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(at))
        .select(
            "n_intervals",
            F.col("peak").cast("long").alias("peak_concurrency"),
            F.col("peak_at_s").cast("long").alias("peak_at_s"),
        )
    )
