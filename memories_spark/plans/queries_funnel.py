"""Product-analytics query shapes: ordered funnel conversion and
weekly retention cohorts.

The reference's analytics layer answers 'how is search quality
trending' with period-bucketed SQL (usage_tracker.py:364-445); a
general engine also needs the two canonical event-sequence rollups —
ordered funnels (did the user do A, then B after A, then C after B)
and cohort retention (of the users who first appeared in week w, how
many were active in week w+k). Both are pure conditional-aggregation
+ join plans; no MATCH_RECOGNIZE engine needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Ordered funnel: view -> click (after view) -> purchase (after click)
# ---------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
),
counts AS (
  SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
         (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
         (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked,
         (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased
)
SELECT n_users, n_viewed, n_clicked, n_purchased,
       round(CAST(n_clicked AS DOUBLE) / n_viewed, 6) AS view_to_click,
       round(CAST(n_purchased AS DOUBLE) / n_clicked, 6) AS click_to_purchase,
       round(CAST(n_purchased AS DOUBLE) / n_viewed, 6) AS full_funnel
FROM counts
"""


@register(
    "funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    doc="Ordered three-stage funnel: first view, first click strictly "
    "after that view, first purchase strictly after that click, with "
    "stage counts and conversion rates. The ordering constraint is "
    "what distinguishes this from naive per-type counts — a click "
    "before any view does not convert. Plan: each stage is one "
    "conditional min-aggregate over events joined to the previous "
    "stage's per-user row (the per-user stage tables are dimension-"
    "sized and broadcast, so the events scan is filtered by "
    "event_type pushdown and never re-shuffles); rates divide exact "
    "BIGINTs.",
    tags=("analytics", "funnel", "agg"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v.withColumnRenamed("user_id", "vu")), F.col("user_id") == F.col("vu"))
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c.withColumnRenamed("user_id", "cu")), F.col("user_id") == F.col("cu"))
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    counts = (
        n_users.crossJoin(F.broadcast(v.agg(F.count("*").alias("n_viewed"))))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_clicked"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_purchased"))))
    )
    return counts.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_viewed").cast("long").alias("n_viewed"),
        F.col("n_clicked").cast("long").alias("n_clicked"),
        F.col("n_purchased").cast("long").alias("n_purchased"),
        F.round(F.col("n_clicked").cast("double") / F.col("n_viewed"), 6).alias(
            "view_to_click"
        ),
        F.round(F.col("n_purchased").cast("double") / F.col("n_clicked"), 6).alias(
            "click_to_purchase"
        ),
        F.round(F.col("n_purchased").cast("double") / F.col("n_viewed"), 6).alias(
            "full_funnel"
        ),
    )


# ---------------------------------------------------------------------
# Weekly retention cohorts
# ---------------------------------------------------------------------

_EPOCH = "TIMESTAMP '2024-01-01 00:00:00'"

_RETENTION_ORACLE = f"""
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('second', {_EPOCH}, ts) / 604800.0) AS BIGINT) AS week
  FROM events
),
first_week AS (
  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
),
cohort_sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first_week GROUP BY cohort_week
),
activity AS (
  SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM weekly w JOIN first_week f ON f.user_id = w.user_id
  GROUP BY f.cohort_week, w.week - f.cohort_week
)
SELECT a.cohort_week, a.week_offset, s.cohort_size, a.n_active,
       round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM activity a JOIN cohort_sizes s ON s.cohort_week = a.cohort_week
ORDER BY a.cohort_week, a.week_offset
"""


@register(
    "weekly_retention_cohorts",
    oracle=_RETENTION_ORACLE,
    bench=True,
    doc="Cohort retention triangle: users grouped by first-activity "
    "week; for each (cohort, week-offset) cell, the share of the "
    "cohort active that week. Plan: one distinct over (user, week) "
    "collapses the event volume to at most users x weeks rows "
    "before anything else (at 100 TB this is the load-bearing "
    "reduction); first-week and cohort-size tables are aggregates "
    "of that small table, joined back by user hash. Retention "
    "divides exact BIGINTs; output is the standard retention "
    "triangle, ~weeks^2/2 rows.",
    tags=("analytics", "retention", "agg"),
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    epoch = F.lit("2024-01-01 00:00:00").cast("timestamp")
    week = F.floor(
        (F.col("ts").cast("double") - epoch.cast("double")) / 604800.0
    ).cast("long")
    weekly = ev.select("user_id", week.alias("week")).distinct()
    first_week = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cohort_sizes = first_week.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    activity = (
        weekly.join(first_week, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    return (
        activity.join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------
# Z-score outlier events (exact-moment anomaly detection)
# ---------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH moments AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT) * CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY event_type
),
stats AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mean_c,
         sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd_c
  FROM moments
)
SELECT e.event_type, e.event_id, round(e.value, 2) AS value,
       round((CAST(round(e.value * 100.0) AS BIGINT) - s.mean_c) / s.sd_c, 4) AS zscore
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE abs(CAST(round(e.value * 100.0) AS BIGINT) - s.mean_c) > 3.0 * s.sd_c
ORDER BY abs((CAST(round(e.value * 100.0) AS BIGINT) - s.mean_c) / s.sd_c) DESC, e.event_id ASC
LIMIT 50
"""


@register(
    "value_outlier_events",
    oracle=_OUTLIER_ORACLE,
    doc="Z-score anomaly scan: events whose value deviates more than "
    "3 sigma from their type's mean, top-50 by |z|. Mean and "
    "variance come from exact integer moment sums (cents and "
    "squared cents as BIGINTs — order-independent, same discipline "
    "as the Pearson query), computed in one partial+final aggregate "
    "and broadcast back onto the scan, so the detector is two "
    "passes over events with no shuffle of the fact rows. The "
    "production shape for metric-stream anomaly flagging.",
    tags=("analytics", "anomaly", "agg"),
)
def value_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    cents = F.round(F.col("value") * 100.0).cast("long")
    moments = ev.select("event_type", cents.alias("c")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    stats = moments.select(
        F.col("event_type").alias("et"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean_c"),
        F.sqrt(
            F.col("s2").cast("double") / F.col("n")
            - (F.col("s1").cast("double") / F.col("n"))
            * (F.col("s1").cast("double") / F.col("n"))
        ).alias("sd_c"),
    )
    dev = cents.cast("double") - F.col("mean_c")
    return (
        ev.join(F.broadcast(stats), F.col("event_type") == F.col("et"))
        .filter(F.abs(dev) > 3.0 * F.col("sd_c"))
        .select(
            "event_type",
            "event_id",
            F.round(F.col("value"), 2).alias("value"),
            F.round(dev / F.col("sd_c"), 4).alias("zscore"),
            F.abs(dev / F.col("sd_c")).alias("_az"),
        )
        .orderBy(F.desc("_az"), F.asc("event_id"))
        .limit(50)
        .drop("_az")
    )


# ---------------------------------------------------------------------
# Rolling 7-day active users (WAU per day) + stickiness
# ---------------------------------------------------------------------

_ROLLING_ORACLE = """
WITH daily AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
covered AS (
  SELECT DISTINCT user_id, d + CAST(x AS INTEGER) AS report_day
  FROM daily, (SELECT unnest(generate_series(0, 6)) AS x)
),
dau AS (
  SELECT d AS report_day, CAST(count(*) AS BIGINT) AS dau FROM daily GROUP BY d
),
wau AS (
  SELECT report_day, CAST(count(*) AS BIGINT) AS wau FROM covered GROUP BY report_day
)
SELECT strftime(w.report_day, '%Y-%m-%d') AS day,
       coalesce(a.dau, 0) AS dau,
       w.wau,
       round(CAST(coalesce(a.dau, 0) AS DOUBLE) / w.wau, 6) AS stickiness
FROM wau w LEFT JOIN dau a ON a.report_day = w.report_day
WHERE w.report_day <= (SELECT max(d) FROM daily)
ORDER BY day
"""


@register(
    "rolling_7d_active_users",
    oracle=_ROLLING_ORACLE,
    doc="Trailing-7-day active users per day (WAU) with DAU and the "
    "DAU/WAU stickiness ratio. The sliding distinct is rewritten as "
    "an explode: each (user, active-day) pair covers the next 7 "
    "report days, and WAU(d) = distinct users covering d — one "
    "distinct + one aggregate instead of a 7-way self-join or a "
    "per-day subquery. The load-bearing first step collapses raw "
    "events to distinct (user, day) pairs (users x days rows), so "
    "the 7x explode happens on the small table, never on the event "
    "volume. Trailing days beyond the data horizon are trimmed.",
    tags=("analytics", "window", "distinct"),
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    covered = daily.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("x")).alias("report_day")).distinct()
    dau = daily.groupBy(F.col("d").alias("report_day")).agg(F.count("*").alias("dau"))
    wau = covered.groupBy("report_day").agg(F.count("*").alias("wau"))
    horizon = daily.agg(F.max("d").alias("max_d"))
    return (
        wau.join(dau, "report_day", "left")
        .crossJoin(F.broadcast(horizon))
        .filter(F.col("report_day") <= F.col("max_d"))
        .select(
            F.date_format("report_day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(
                F.coalesce(F.col("dau"), F.lit(0)).cast("double") / F.col("wau"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------
# First-touch revenue attribution
# ---------------------------------------------------------------------

_ATTR_ORACLE = """
WITH first_touch AS (
  SELECT user_id, min(ts) AS ft_ts FROM events WHERE event_type = 'view' GROUP BY user_id
),
attributed AS (
  SELECT CAST(hour(f.ft_ts) AS BIGINT) AS first_touch_hour,
         CAST(round(e.value * 100.0) AS BIGINT) AS rev_c
  FROM events e JOIN first_touch f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > f.ft_ts
)
SELECT first_touch_hour,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(CAST(sum(rev_c) AS DOUBLE) / 100.0, 2) AS attributed_revenue
FROM attributed
GROUP BY first_touch_hour
ORDER BY first_touch_hour
"""


@register(
    "first_touch_attribution",
    oracle=_ATTR_ORACLE,
    doc="First-touch attribution: every purchase made after a user's "
    "first view credits that first view's hour-of-day — the "
    "marketing-attribution rollup answering 'which acquisition hour "
    "drives revenue'. Plan: first-touch table is one min-aggregate "
    "(|users| rows) broadcast onto the purchase-filtered scan; the "
    "strictly-after predicate rides the join; revenue sums in exact "
    "cents. The last-touch / linear variants swap the min for a max "
    "or a per-touch weight on the same plan shape.",
    tags=("analytics", "attribution", "agg"),
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    first_touch = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.col("user_id").alias("ft_user"))
        .agg(F.min("ts").alias("ft_ts"))
    )
    attributed = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(first_touch), F.col("user_id") == F.col("ft_user"))
        .filter(F.col("ts") > F.col("ft_ts"))
        .select(
            F.hour("ft_ts").cast("long").alias("first_touch_hour"),
            F.round(F.col("value") * 100.0).cast("long").alias("rev_c"),
        )
    )
    return (
        attributed.groupBy("first_touch_hour")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("rev_c").cast("double") / 100.0, 2).alias(
                "attributed_revenue"
            ),
        )
        .orderBy("first_touch_hour")
    )


# ---------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS dst
  FROM events
),
trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
outdeg AS (
  SELECT src, CAST(sum(n) AS BIGINT) AS total FROM trans GROUP BY src
)
SELECT t.src, t.dst, t.n,
       round(CAST(t.n AS DOUBLE) / o.total, 6) AS p
FROM trans t JOIN outdeg o ON o.src = t.src
ORDER BY t.src, t.dst
"""


@register(
    "event_transition_matrix",
    oracle=_TRANSITION_ORACLE,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: counts and estimated probabilities of each "
    "(event_type -> next event_type) step, ordered by event time "
    "with id tie-breaks. Plan: ONE window shuffle on user_id builds "
    "the lag pairs, the transition aggregate is 25 cells, and the "
    "row-normalizing out-degree is an aggregate of that tiny table "
    "joined back by broadcast. The behavioral-model shape behind "
    "next-action prediction and anomaly scoring on sequences.",
    tags=("analytics", "sequence", "window"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    trans = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    # row-normalize with a window-sum over the (tiny) transition table
    # instead of a second aggregation + join: the lead-window subtree
    # would otherwise be evaluated once per reference
    total = F.sum("n").over(Window.partitionBy("src"))
    return (
        trans.select(
            "src",
            "dst",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / total.cast("double"), 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


# ---------------------------------------------------------------------
# Event-type co-occurrence lift (association mining)
# ---------------------------------------------------------------------

_COOC_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n_users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_a FROM ut GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_both,
       round(CAST(p.n_both AS DOUBLE) / n.n, 6) AS support,
       round((CAST(p.n_both AS DOUBLE) / n.n)
             / ((CAST(sa.n_a AS DOUBLE) / n.n) * (CAST(sb.n_a AS DOUBLE) / n.n)), 4) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n_users n
ORDER BY type_a, type_b
"""


@register(
    "event_cooccurrence_lift",
    oracle=_COOC_ORACLE,
    doc="Association mining over user behavior: support and lift for "
    "every unordered pair of event types co-occurring in a user's "
    "history (lift > 1 means the pair co-occurs more than "
    "independence predicts). Plan: the load-bearing reduction is "
    "the distinct (user, type) table (at most 5 rows per user) "
    "BEFORE the self-join; the ordered type_a < type_b condition "
    "emits each pair once; marginals and the user total are tiny "
    "broadcast joins. The basket-analysis shape — at 100 TB the "
    "self-join runs on the collapsed table, never the event log.",
    tags=("analytics", "association", "join"),
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(F.countDistinct("user_id").alias("n"))
    singles = ut.groupBy("event_type").agg(F.count("*").alias("n_a"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("ub"), F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, (F.col("user_id") == F.col("ub")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("ea"), F.col("n_a").alias("na"))
    sb = singles.select(F.col("event_type").alias("eb"), F.col("n_a").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), F.col("type_a") == F.col("ea"))
        .join(F.broadcast(sb), F.col("type_b") == F.col("eb"))
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(F.col("n_both").cast("double") / F.col("n"), 6).alias("support"),
            F.round(
                (F.col("n_both").cast("double") / F.col("n"))
                / (
                    (F.col("na").cast("double") / F.col("n"))
                    * (F.col("nb").cast("double") / F.col("n"))
                ),
                4,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )
