"""Statistics + set-operation queries: INTERSECT/EXCEPT cohorts,
decile bucketing, calendar gap-filling, and exact-sum Pearson
correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.topk import global_rank, ntile_from_rank
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Set operations: cohort intersect / except
# ---------------------------------------------------------------------

_COHORT_ORACLE = """
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
purchasers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
both_set AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM purchasers),
click_only AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM purchasers)
SELECT user_id, 'converted' AS cohort FROM both_set
UNION ALL
SELECT user_id, 'click_only' AS cohort FROM click_only
ORDER BY cohort, user_id
"""


@register(
    "conversion_cohorts",
    oracle=_COHORT_ORACLE,
    doc="Set-operation cohorts (reference T5 candidate-set union "
    "family completed with INTERSECT/EXCEPT): users who both "
    "clicked and purchased vs clicked-only. Spark's intersect/"
    "exceptAll compile to aggregate-based joins over the already-"
    "distinct cohort sets, so the inputs are |users| rows, not "
    "|events|; both branches reuse one scan of events.",
    tags=("setop", "events"),
)
def conversion_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    both = clickers.intersect(purchasers).select(
        "user_id", F.lit("converted").alias("cohort")
    )
    only = clickers.exceptAll(purchasers).select(
        "user_id", F.lit("click_only").alias("cohort")
    )
    return both.unionByName(only).orderBy("cohort", "user_id")


# ---------------------------------------------------------------------
# Decile bucketing of customer revenue (ntile window)
# ---------------------------------------------------------------------

_DECILE_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice*100.0) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, rev_c,
         ntile(10) OVER (ORDER BY rev_c DESC, o_custkey ASC) AS decile
  FROM rev
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(rev_c) AS DOUBLE)/100.0, 2) AS decile_revenue,
       round(CAST(min(rev_c) AS DOUBLE)/100.0, 2) AS min_revenue,
       round(CAST(max(rev_c) AS DOUBLE)/100.0, 2) AS max_revenue
FROM tiled GROUP BY decile ORDER BY decile
"""


@register(
    "customer_revenue_deciles",
    oracle=_DECILE_ORACLE,
    doc="Revenue deciles: per-customer revenue (one shuffle over "
    "orders with map-side partial agg), then decile assignment via "
    "the two-phase distributed rank (range-repartition + "
    "per-partition offsets, functions/topk.global_rank) and "
    "closed-form ntile arithmetic — NO single-partition window over "
    "the |customers|-sized aggregate, so the plan survives a corpus "
    "where the per-customer table itself is billions of rows. "
    "Tie-break on custkey keeps tile assignment deterministic. The "
    "summary collapses each decile to one row (exact cents).",
    tags=("window", "ntile", "agg"),
)
def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    rev = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev_c"))
    ranked = global_rank(
        rev, [F.desc("rev_c"), F.asc("o_custkey")], rank_col="rn", total_col="n_tot"
    )
    tiled = ranked.select(
        "o_custkey", "rev_c", ntile_from_rank("rn", "n_tot", 10).alias("decile")
    )
    return (
        tiled.groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("rev_c").cast("double") / 100.0, 2).alias("decile_revenue"),
            F.round(F.min("rev_c").cast("double") / 100.0, 2).alias("min_revenue"),
            F.round(F.max("rev_c").cast("double") / 100.0, 2).alias("max_revenue"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------
# Calendar gap-filling: hourly spine with zero rows for silent hours
# ---------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds), (SELECT hi FROM bounds), INTERVAL 1 HOUR)) AS hour_ts
),
types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT date_trunc('hour', ts) AS hour_ts, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(s.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour,
       t.event_type AS event_type,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN actual a ON a.hour_ts = s.hour_ts AND a.event_type = t.event_type
ORDER BY hour, t.event_type
"""


@register(
    "hourly_gapfill_counts",
    oracle=_GAPFILL_ORACLE,
    doc="Time-series gap filling: hourly event counts per type with "
    "explicit zero rows for silent hours — the calendar-spine left "
    "join every dashboard needs (missing rows read as 'no data' "
    "otherwise). The spine is generated from the observed min/max "
    "hour (sequence + explode of a single aggregated row — no "
    "driver round-trip) and is tiny, so it broadcasts; the real "
    "aggregation is the usual one shuffle over events.",
    tags=("window", "events", "gapfill"),
)
def hourly_gapfill_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    types = ev.select("event_type").distinct().withColumnRenamed("event_type", "etype")
    actual = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("a_hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    return (
        F.broadcast(spine)
        .crossJoin(F.broadcast(types))
        .join(
            actual,
            (F.col("a_hour") == F.col("hour_ts")) & (F.col("event_type") == F.col("etype")),
            "left",
        )
        .select(
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("etype").alias("event_type"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------
# Exact-sum Pearson correlation (value vs hour-of-day, per type)
# ---------------------------------------------------------------------

_CORR_ORACLE = """
WITH obs AS (
  SELECT event_type,
         CAST(hour(ts) AS BIGINT) AS x,
         CAST(round(value*100.0) AS BIGINT) AS y
  FROM events
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*y) AS BIGINT) AS sxy,
         CAST(sum(x*x) AS BIGINT) AS sxx,
         CAST(sum(y*y) AS BIGINT) AS syy
  FROM obs GROUP BY event_type
)
SELECT event_type, n,
       round((n*sxy - sx*sy) /
             (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
         AS corr_value_hour
FROM sums ORDER BY event_type
"""


@register(
    "value_hour_correlation",
    oracle=_CORR_ORACLE,
    doc="Pearson correlation of event value vs hour-of-day per type, "
    "computed from exact integer moment sums (n, Sx, Sy, Sxy, Sxx, "
    "Syy in one aggregation pass — cents keep Syy far from BIGINT "
    "overflow at any realistic scale) with the closed form applied "
    "after. Unlike float-accumulating corr(), the integer sums are "
    "associative, so the result is bit-identical regardless of "
    "partitioning — the distributed-safe way to do moment "
    "statistics.",
    tags=("agg", "stats", "events"),
)
def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    x = F.hour("ts").cast("long")
    y = F.round(F.col("value") * 100.0).cast("long")
    obs = ev.select("event_type", x.alias("x"), y.alias("y"))
    sums = obs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "event_type",
        "n",
        F.round(num / den, 6).alias("corr_value_hour"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------
# Revenue concentration: Lorenz deciles + grouped-data Gini
# ---------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev_c,
         ntile(10) OVER (ORDER BY rev_c ASC, o_custkey ASC) AS decile
  FROM per_cust
),
dec AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_custs,
         CAST(sum(rev_c) AS BIGINT) AS dec_rev_c
  FROM ranked GROUP BY decile
),
tot AS (SELECT CAST(sum(dec_rev_c) AS BIGINT) AS tot_c, CAST(sum(n_custs) AS BIGINT) AS n FROM dec),
lorenz AS (
  SELECT d.decile, d.n_custs,
         round(CAST(d.dec_rev_c AS DOUBLE) / t.tot_c, 6) AS rev_share,
         round(CAST(sum(d.dec_rev_c) OVER (ORDER BY d.decile) AS DOUBLE) / t.tot_c, 6) AS cum_rev_share
  FROM dec d CROSS JOIN tot t
)
SELECT decile, n_custs, rev_share, cum_rev_share
FROM lorenz
ORDER BY decile
"""


@register(
    "revenue_lorenz_deciles",
    oracle=_LORENZ_ORACLE,
    doc="Revenue concentration: Lorenz curve over customer revenue "
    "deciles — per decile (poorest to richest), the revenue share "
    "and cumulative share; the classic inequality diagnostic (the "
    "grouped-data Gini is 1 - 2*mean(cum_share) + mean(share), "
    "computable from these ten rows). Plan: one per-customer "
    "aggregate, then the two-phase distributed rank + closed-form "
    "ntile arithmetic (functions/topk.global_rank) instead of a "
    "single-partition ntile window, and exact cents shares — the "
    "only remaining window runs over the ten decile rows.",
    tags=("stats", "distribution", "window"),
)
def revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    gr = global_rank(
        per_cust,
        [F.asc("rev_c"), F.asc("o_custkey")],
        rank_col="rn",
        total_col="n_tot",
    )
    ranked = gr.select("rev_c", ntile_from_rank("rn", "n_tot", 10).alias("decile"))
    dec = ranked.groupBy("decile").agg(
        F.count("*").alias("n_custs"), F.sum("rev_c").cast("long").alias("dec_rev_c")
    )
    tot = dec.agg(
        F.sum("dec_rev_c").cast("long").alias("tot_c"),
        F.sum("n_custs").cast("long").alias("n"),
    )
    cw = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n_custs").cast("long").alias("n_custs"),
            F.round(F.col("dec_rev_c").cast("double") / F.col("tot_c"), 6).alias(
                "rev_share"
            ),
            F.round(
                F.sum("dec_rev_c").over(cw).cast("double") / F.col("tot_c"), 6
            ).alias("cum_rev_share"),
        )
        .orderBy("decile")
    )
