"""Relational widening batch 4: the remaining classic TPC-H query
shapes, adapted to the testdata star schema (which has no partsupp
table and no shipmode/receiptdate columns — see TESTDATA.md).

Shapes pinned here: pure pushdown scan-agg (Q6), nation-pair volume
join (Q7), market-share ratio (Q8), returned-item top-k (Q10),
max-of-aggregate (Q15), count-distinct with NOT-IN exclusion (Q16),
disjunctive OR-of-ANDs predicate join (Q19), global-average anti-join
cohort (Q22), and per-group argmin join (Q2 shape via lineitem unit
prices). The reference (divyekant/memories) composes similar shapes
ad hoc in its SQLite analytics layer (usage_tracker.py:364-861);
these give a migrating user the full relational vocabulary with
scale-safe Spark plans.

Determinism: every money sum is exact fixed-point cents (BIGINT),
every ratio is a division of two BIGINTs, every top-k ties on a key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables


def _cents(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100.0).cast("long")


_REV_CENTS = "CAST(round(l_extendedprice*(1.0-l_discount)*100.0) AS BIGINT)"


# ---------------------------------------------------------------------
# Q6: pure scan → filter → agg; everything pushes to the parquet scan
# ---------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT round(CAST(sum({_REV_CENTS.replace('(1.0-l_discount)', 'l_discount')}) AS DOUBLE)/100.0, 2) AS promo_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@register(
    "q6_forecast_revenue",
    oracle=_Q6_ORACLE,
    bench=True,
    doc="TPC-H Q6 forecast-revenue: single scan, all four predicates "
    "eligible for parquet pushdown (shipdate/discount/quantity are "
    "plain comparisons), two-column ReadSchema, one partial+final "
    "agg with zero shuffle rows beyond the 32 partials. The cheapest "
    "possible plan shape — the bench entry exists to keep scan+filter "
    "throughput visible in isolation. Ref: the reference's period "
    "revenue rollups (usage_tracker.py:364-445).",
    tags=("scan", "agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_rev_c = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100.0
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.round(F.sum(disc_rev_c).cast("double") / 100.0, 2).alias(
                "promo_revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------
# Q7: volume shipping between a nation pair, both directions
# ---------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(rev_c) AS DOUBLE)/100.0, 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         {_REV_CENTS} AS rev_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_volume_shipping",
    oracle=_Q7_ORACLE,
    bench=True,
    doc="TPC-H Q7 volume-shipping between two nations. Scale plan: "
    "both dimension chains collapse to broadcasts — suppliers and "
    "customers are pre-filtered to the two nations (small sets) and "
    "broadcast onto the fact scans, so lineitem is reduced by the "
    "date filter + supplier semi-join and orders by the customer "
    "semi-join BEFORE the one unavoidable big-big shuffle join on "
    "orderkey (no partsupp table exists to pre-pair them). The "
    "nation-pair disjunction is evaluated post-join on two tiny "
    "string columns. Final agg cardinality is 2 nations x 2 years.",
    tags=("join", "star", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    nations = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        t["supplier"]
        .join(
            F.broadcast(nations.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(nations.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    orders = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    li = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").cast("long").alias("l_year"),
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("long").alias("rev_c"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("rev_c").cast("double") / 100.0, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------
# Q8: market share of one nation inside one region, per year
# ---------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_c ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_c) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         n1.n_name AS supp_nation,
         {_REV_CENTS} AS rev_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'REGION_0'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "q8_market_share",
    oracle=_Q8_ORACLE,
    doc="TPC-H Q8 market share: NATION_1's fraction of PROMO-part "
    "revenue sold into REGION_0, per order year. All five dimension "
    "joins (part filtered to one type, supplier+nation, customer+"
    "nation+region) broadcast; the share is a conditional fixed-point "
    "sum over the same aggregated row set, so numerator and "
    "denominator come out of ONE hash aggregate — no second pass, "
    "no self-join, and the ratio of two BIGINTs is order-independent.",
    tags=("join", "star", "agg", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_nat = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    region_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "REGION_0")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = (
        t["customer"]
        .join(F.broadcast(region_nations), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("c_custkey")
    )
    orders = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    )
    li = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "supp_nation",
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("long").alias("rev_c"),
        )
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("rev_c")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("rev_c").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------
# Q10: top customers by returned-item revenue
# ---------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(CAST(sum({_REV_CENTS}) AS DOUBLE)/100.0, 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=_Q10_ORACLE,
    bench=True,
    doc="TPC-H Q10 returned-item report: top-20 customers by revenue "
    "of 'R'-flagged lines on H1-1997 orders. The fact-fact join "
    "aggregates lineitem revenue per orderkey only AFTER the "
    "returnflag filter, joins the half-year orders slice, rolls up "
    "to per-customer, and only then touches the customer+nation "
    "dimensions (broadcast) — the wide name columns never enter a "
    "shuffle. Top-20 runs as TakeOrderedAndProject with custkey "
    "tie-break.",
    tags=("join", "star", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("long").alias("rev_c"),
        )
    )
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    cust = t["customer"].select("c_custkey", "c_name", "c_nationkey").join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("rev_c").cast("double") / 100.0, 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------
# Q15: supplier(s) achieving the maximum quarterly revenue
# ---------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_REV_CENTS}) AS BIGINT) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total_c AS DOUBLE)/100.0, 2) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_c = (SELECT max(total_c) FROM rev)
ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    doc="TPC-H Q15 top supplier: suppliers whose Q1-1997 revenue "
    "equals the global maximum (ties kept). One shuffle builds the "
    "per-supplier aggregate; the max is a rank() over a single "
    "unpartitioned window on that already-tiny table (|suppliers| "
    "rows), so no second scan of the fact and no self-join — the "
    "classic VIEW+MAX formulation collapses into window-rank=1. "
    "Supplier names arrive via broadcast after the filter.",
    tags=("agg", "window", "max-of-agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
                ).cast("long")
            ).cast("long").alias("total_c")
        )
    )
    best = rev.withColumn(
        "rk", F.rank().over(Window.orderBy(F.desc("total_c")))
    ).filter(F.col("rk") == 1)
    return (
        best.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_c").cast("double") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------
# Q16: supplier variety per (brand, type) with NOT-IN exclusion
# ---------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 25
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
"""


@register(
    "q16_supplier_variety",
    oracle=_Q16_ORACLE,
    doc="TPC-H Q16 shape (partsupp replaced by observed lineitem "
    "part-supplier pairs): distinct suppliers per (brand, type) for "
    "small parts, excluding negative-balance suppliers via NOT IN. "
    "The exclusion list is tiny → broadcast left-anti join, never a "
    "shuffle. The pair set is deduplicated map-side by the partial "
    "distinct-agg expand, and the brand/type dimension arrives by "
    "broadcast. Count-distinct runs as Spark's two-phase "
    "partial-distinct aggregate, not an exact global sort.",
    tags=("join", "antijoin", "distinct-agg"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    part = t["part"].filter(F.col("p_size") <= 25).select("p_partkey", "p_brand", "p_type")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
    )


# ---------------------------------------------------------------------
# Q19: disjunctive OR-of-ANDs predicate join
# ---------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT round(CAST(sum({_REV_CENTS}) AS DOUBLE)/100.0, 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 1.0 AND l.l_quantity <= 15.0)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity >= 10.0 AND l.l_quantity <= 30.0)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity >= 20.0 AND l.l_quantity <= 45.0)
"""


@register(
    "q19_disjunctive_join",
    oracle=_Q19_ORACLE,
    bench=True,
    doc="TPC-H Q19 disjunctive predicate join: revenue over three "
    "OR'd brand/size/quantity conjunctions. Catalyst extracts the "
    "common l_quantity bounds (>=1, <=45) as a pushed scan filter "
    "and the part side is pre-filtered to the three brands before "
    "broadcast, so the disjunction only evaluates on broadcast-hash "
    "matches — the anti-pattern (cartesian with OR condition) never "
    "appears; .explain is gated in tests to stay a "
    "BroadcastHashJoin.",
    tags=("join", "disjunction", "agg"),
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = (
        t["part"]
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & (F.col("p_size") >= 1))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = t["lineitem"].filter(
        (F.col("l_quantity") >= 1.0) & (F.col("l_quantity") <= 45.0)
    ).select(
        "l_partkey",
        "l_quantity",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        ).cast("long").alias("rev_c"),
    )
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 10)
        & F.col("l_quantity").between(1.0, 15.0)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 20)
        & F.col("l_quantity").between(10.0, 30.0)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") <= 30)
        & F.col("l_quantity").between(20.0, 45.0)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum("rev_c").cast("double") / 100.0, 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------
# Q22: above-average-balance customers with no orders, by nation
# ---------------------------------------------------------------------

_Q22_ORACLE = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal*100.0) AS BIGINT)) AS BIGINT) AS bal_c,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS n_custs,
       round(CAST(sum(CAST(round(c.c_acctbal*100.0) AS BIGINT)) AS DOUBLE)/100.0, 2) AS total_bal
FROM customer c, pos
WHERE CAST(round(c.c_acctbal*100.0) AS BIGINT) > CAST(pos.bal_c AS DOUBLE) / pos.n
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@register(
    "q22_idle_balances",
    oracle=_Q22_ORACLE,
    doc="TPC-H Q22 shape: customers with above-average positive "
    "balance who never placed an order, rolled up by nation. The "
    "global average is an exact BIGINT cents-sum/count broadcast as "
    "one row (order-independent, unlike a naive double avg); the "
    "no-orders test is a left-anti join against the distinct "
    "o_custkey projection. At scale the anti-join is the only "
    "shuffle — the average costs one scan of the already-loaded "
    "column.",
    tags=("antijoin", "scalar-subquery", "agg"),
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_c")
    )
    pos = cust.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").cast("long").alias("tot_c"), F.count("*").alias("n")
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_c") > F.col("tot_c").cast("double") / F.col("n")
    )
    idle = rich.join(
        t["orders"].select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("bal_c").cast("double") / 100.0, 2).alias("total_bal"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------
# Q2 shape: per-part argmin supplier by observed unit price
# ---------------------------------------------------------------------

_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice/l_quantity*100.0) AS BIGINT)) AS unit_c
  FROM lineitem
  WHERE l_quantity > 0.0
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, min(unit_c) AS best_c FROM cost GROUP BY l_partkey
)
SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey, s.s_name,
       round(CAST(c.unit_c AS DOUBLE)/100.0, 2) AS unit_price
FROM cost c
JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_c = b.best_c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
ORDER BY unit_price DESC, p_partkey ASC, s_suppkey ASC
LIMIT 100
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_ORACLE,
    doc="TPC-H Q2 shape (no partsupp table — supply cost proxied by "
    "the minimum observed unit price per part-supplier pair): for "
    "each part, the supplier(s) achieving the per-part minimum unit "
    "price, ties kept, top-100 by price. The correlated-min "
    "subquery becomes a min() window over the per-pair aggregate — "
    "one shuffle keyed by partkey serves both the pair agg and the "
    "window, and Spark's WindowGroupLimit-style rank filter avoids "
    "re-joining cost to best. Supplier names broadcast at the end.",
    tags=("agg", "window", "argmin", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    unit_c = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100.0).cast("long")
    cost = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 0.0)
        .select("l_partkey", "l_suppkey", unit_c.alias("u_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("u_c").alias("unit_c"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_c", F.min("unit_c").over(w)).filter(
        F.col("unit_c") == F.col("best_c")
    )
    return (
        best.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round(F.col("unit_c").cast("double") / 100.0, 2).alias("unit_price"),
        )
        .orderBy(F.desc("unit_price"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------
# Q12: priority classes per line status (shipmode adapted away)
# ---------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register(
    "q12_priority_classes",
    oracle=_Q12_ORACLE,
    doc="TPC-H Q12 shape (no l_shipmode column — grouped by returnflag "
    "instead): per flag, how many 1997-shipped lines belong to "
    "high-priority vs low-priority orders, as one conditional "
    "aggregation. The date filter prunes lineitem at the scan; the "
    "orders side projects only (orderkey, priority) before the "
    "big-big join, so the shuffled payload is two columns. Both "
    "class counts come out of ONE HashAggregate.",
    tags=("join", "agg", "conditional"),
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    orders = t["orders"].select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------
# Q14: promo revenue share per month
# ---------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT CAST(year(l.l_shipdate) AS BIGINT) AS y,
       CAST(month(l.l_shipdate) AS BIGINT) AS m,
       round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_CENTS} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_REV_CENTS}) AS DOUBLE), 4) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY year(l.l_shipdate), month(l.l_shipdate)
ORDER BY y, m
"""


@register(
    "q14_promo_effect",
    oracle=_Q14_ORACLE,
    doc="TPC-H Q14 promotion effect, widened to a monthly series: the "
    "percentage of H1-1997 revenue from PROMO-type parts. The part "
    "type dimension broadcasts onto the date-pruned lineitem scan "
    "and numerator/denominator are conditional fixed-point sums in "
    "ONE aggregation — the same single-agg ratio discipline as Q8; "
    "the ratio of two BIGINTs is order-independent.",
    tags=("join", "agg", "ratio"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select(
        "l_partkey",
        F.year("l_shipdate").cast("long").alias("y"),
        F.month("l_shipdate").cast("long").alias("m"),
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        ).cast("long").alias("rev_c"),
    )
    part = t["part"].select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("y", "m")
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(0)
                ).cast("double")
                / F.sum("rev_c").cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
        .orderBy("y", "m")
    )
