"""Advanced analytics batch 10: multi-touch attribution, conversion
latency percentiles, per-group OLS trends, and referential-integrity
auditing.

Determinism contract as per the registry module docstring. Decay
weights follow the recency_topk approach (exact-microsecond ages,
IEEE pow) but every SUM of float-derived quantities goes through a
fixed-point BIGINT so aggregation order can never change a digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Multi-touch attribution (linear + time-decay) within a 24h window
# ---------------------------------------------------------------------

_MTA_ORACLE = """
WITH purchases AS (
  SELECT event_id AS pid, user_id, ts AS pts, value
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT event_id AS tid, user_id, event_type AS touch_type, ts AS tts
  FROM events WHERE event_type IN ('view', 'click')
),
joined AS (
  SELECT p.pid, p.value, t.touch_type,
         CAST(round(power(0.5,
           (epoch_us(p.pts) - epoch_us(t.tts)) / 43200000000.0) * 1e12)
           AS BIGINT) AS w_fp
  FROM purchases p JOIN touches t
    ON p.user_id = t.user_id
   AND t.tts < p.pts
   AND t.tts >= p.pts - INTERVAL 24 HOURS
),
per_purchase AS (
  SELECT pid, CAST(count(*) AS BIGINT) AS n_touches,
         CAST(sum(w_fp) AS BIGINT) AS sum_w
  FROM joined GROUP BY pid
),
credits AS (
  SELECT j.touch_type,
         CAST(round(j.value / pp.n_touches * 1e6) AS BIGINT) AS linear_fp,
         CAST(round(j.value * (CAST(j.w_fp AS DOUBLE) / pp.sum_w) * 1e6)
           AS BIGINT) AS decay_fp
  FROM joined j JOIN per_purchase pp ON j.pid = pp.pid
)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_credits,
       round(CAST(sum(linear_fp) AS DOUBLE) / 1e6, 4) AS linear_value,
       round(CAST(sum(decay_fp) AS DOUBLE) / 1e6, 4) AS decay_value
FROM credits
GROUP BY touch_type
ORDER BY touch_type
"""


@register(
    "multi_touch_attribution",
    bench=True,
    oracle=_MTA_ORACLE,
    doc="Multi-touch revenue attribution: every view/click in the 24 "
    "hours before a purchase shares that purchase's value, under "
    "both the linear scheme (equal split) and 12h-half-life time "
    "decay (recent touches earn more) — the generalization of "
    "first_touch_attribution. The touch-purchase pairing is an "
    "equi-join on user_id with the time window as a residual "
    "predicate, so fan-out is bounded per user, never corpus-wide. "
    "Decay weights are computed once, frozen to fixed-point "
    "BIGINTs, and every downstream share/sum works on integers — "
    "aggregation order cannot change a digit at any parallelism. "
    "Two shuffles total: the user_id join and the per-purchase "
    "normalization groupBy.",
    tags=("product", "attribution"),
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
    )
    gap_us = F.unix_micros("pts") - F.unix_micros("tts")
    joined = (
        purchases.join(touches, "user_id")
        .filter(
            (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 24 HOURS"))
        )
        .select(
            "pid",
            "value",
            "touch_type",
            F.round(
                F.pow(F.lit(0.5), gap_us / F.lit(43200000000.0)) * F.lit(1e12)
            )
            .cast("long")
            .alias("w_fp"),
        )
    )
    # Per-purchase normalization as a PARTITIONED window instead of
    # groupBy + self-join: one pass over the touch-purchase pairs
    # (partitioned by pid — bounded per purchase, scale-safe) instead
    # of computing the pair join twice and shuffling it a second time
    # for the re-join. Same exact integer math, same groups.
    wpid = Window.partitionBy("pid")
    n_touches = F.count("*").over(wpid)
    sum_w = F.sum("w_fp").over(wpid)
    credits = joined.select(
        "touch_type",
        F.round(F.col("value") / n_touches * F.lit(1e6))
        .cast("long")
        .alias("linear_fp"),
        F.round(
            F.col("value")
            * (F.col("w_fp").cast("double") / sum_w)
            * F.lit(1e6)
        )
        .cast("long")
        .alias("decay_fp"),
    )
    return (
        credits.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_credits"),
            F.round(F.sum("linear_fp").cast("double") / F.lit(1e6), 4).alias(
                "linear_value"
            ),
            F.round(F.sum("decay_fp").cast("double") / F.lit(1e6), 4).alias(
                "decay_value"
            ),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------
# Conversion latency percentiles (first view -> first purchase)
# ---------------------------------------------------------------------

_CONVLAT_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
gaps AS (
  SELECT CAST(floor(epoch(first_purchase)) - floor(epoch(first_view)) AS BIGINT)
           AS gap_s
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase > first_view
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(gap_s) AS BIGINT) AS s
        FROM gaps),
dv AS (
  SELECT gap_s, count(*) AS c FROM gaps GROUP BY gap_s
),
cum AS (
  SELECT gap_s,
         sum(c) OVER (ORDER BY gap_s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM dv
)
SELECT t.n AS n_users,
       round(CAST(t.s AS DOUBLE) / t.n, 4) AS mean_gap_s,
       (SELECT min(gap_s) FROM cum WHERE cc * 100 >= t.n * 50) AS p50_s,
       (SELECT min(gap_s) FROM cum WHERE cc * 100 >= t.n * 90) AS p90_s,
       (SELECT min(gap_s) FROM cum WHERE cc * 100 >= t.n * 99) AS p99_s
FROM tot t
"""


@register(
    "conversion_latency_percentiles",
    oracle=_CONVLAT_ORACLE,
    doc="Time-to-convert distribution: seconds from each user's first "
    "view to their first purchase, summarized as exact nearest-rank "
    "p50/p90/p99 plus the exact mean — the product-analytics twin "
    "of interorder_gap_profile, built the same scale-safe way: one "
    "conditional-min groupBy per user, then percentiles via the "
    "distinct-gap-value cumulative table (no global row sort — the "
    "window runs over DISTINCT gap values, already tiny). The "
    "nearest-rank comparisons are pure integer (cc*100 >= n*p).",
    tags=("product", "stats"),
)
def conversion_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    gaps = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).alias("gap_s")
    )
    tot = gaps.agg(
        F.count("*").alias("n"), F.sum("gap_s").alias("s")
    )
    dv = gaps.groupBy("gap_s").agg(F.count("*").alias("c"))
    cum = dv.select(
        "gap_s",
        F.sum("c")
        .over(
            Window.orderBy("gap_s").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cc"),
    )
    ranked = cum.crossJoin(F.broadcast(tot))
    pct = lambda p: F.min(  # noqa: E731
        F.when(F.col("cc") * 100 >= F.col("n") * p, F.col("gap_s"))
    ).alias(f"p{p}_s")
    return ranked.groupBy().agg(
        F.first("n").alias("n_users"),
        F.round(F.first("s").cast("double") / F.first("n"), 4).alias(
            "mean_gap_s"
        ),
        pct(50),
        pct(90),
        pct(99),
    )


# ---------------------------------------------------------------------
# Per-group OLS trend (value vs. hours since corpus start)
# ---------------------------------------------------------------------

_TREND_ORACLE = """
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
lo AS (SELECT min(h) AS h0 FROM base),
xy AS (
  SELECT event_type, b.h - l.h0 AS x, cents AS y FROM base b, lo l
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY event_type
)
SELECT event_type, n AS n_events,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6)
         AS slope_per_hour,
       round((CAST(sy AS DOUBLE) / n
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * (CAST(sx AS DOUBLE) / n)) / 100.0, 6) AS intercept
FROM m
ORDER BY event_type
"""


@register(
    "value_trend_by_type",
    oracle=_TREND_ORACLE,
    doc="Per-group OLS regression: the linear trend of event value "
    "over time, fitted independently per event type from exact "
    "BIGINT moment sums (x rebased to hours-since-corpus-start via "
    "a 1-row broadcast so n*sum(xy) stays far from BIGINT "
    "overflow; y in cents). The grouped generalization of "
    "zipf_slope_fit's global regression — slope and intercept per "
    "key in ONE map-side-combinable aggregation pass, no window, "
    "no sort. Division to doubles happens only at output.",
    tags=("stats", "temporal"),
)
def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type",
        (F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"),
        F.round(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    lo = base.agg(F.min("h").alias("h0"))
    xy = base.crossJoin(F.broadcast(lo)).select(
        "event_type",
        (F.col("h") - F.col("h0")).alias("x"),
        F.col("cents").alias("y"),
    )
    m = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * (F.col("sx").cast("double") / F.col("n"))
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(slope / F.lit(100.0), 6).alias("slope_per_hour"),
        F.round(intercept / F.lit(100.0), 6).alias("intercept"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------
# Referential-integrity audit (the data-quality gate before training)
# ---------------------------------------------------------------------


def _ri_one_sql(name: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
  SELECT '{name}' AS check_name,
         CAST((SELECT count(*) FROM {child}) AS BIGINT) AS total_rows,
         CAST((SELECT count(*) FROM {child} c
               WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                 WHERE p.{pk} = c.{ck})) AS BIGINT)
           AS violations
"""


_RI_ORACLE = (
    _ri_one_sql("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
    + " UNION ALL "
    + _ri_one_sql("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey")
    + " UNION ALL "
    + _ri_one_sql("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey")
    + " UNION ALL "
    + _ri_one_sql("orders->customer", "orders", "o_custkey", "customer", "c_custkey")
    + " ORDER BY check_name"
)


@register(
    "referential_integrity_audit",
    oracle=_RI_ORACLE,
    doc="Referential-integrity audit across the star schema: for each "
    "foreign-key edge, the count of child rows whose key has no "
    "parent — the validation gate a training pipeline runs before "
    "trusting joins (an orphaned key silently drops rows from "
    "every inner join downstream). Each check is a LEFT ANTI join; "
    "small parents (part/supplier/customer) broadcast so the fact "
    "table never shuffles for them, and the orders-side check "
    "shares the child scan. Totals come from the same pass via "
    "count aggregates, not separate scans per check.",
    tags=("ops", "quality"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = None
    for name, child, ck, parent, pk in (
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ):
        child_keys = t[child].select(F.col(ck).alias("k"))
        parent_keys = t[parent].select(F.col(pk).alias("k"))
        orphans = child_keys.join(F.broadcast(parent_keys), "k", "left_anti")
        row = (
            child_keys.agg(F.count("*").alias("total_rows"))
            .crossJoin(orphans.agg(F.count("*").alias("violations")))
            .select(
                F.lit(name).alias("check_name"), "total_rows", "violations"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("check_name")
