"""Relational coverage widening: EXISTS semi-joins, outer-join
histograms, and scalar-subquery shapes.

The reference has no explicit SQL engine for these, but its analytics
layer composes the same shapes ad hoc (usage_tracker.py anti-joins
and HAVING filters); these queries pin the remaining classic
relational patterns a migrating user would expect, each with a
DuckDB oracle and an explicitly scale-safe Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# EXISTS-style semi-join: orders with at least one late line
# ---------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register(
    "late_order_priority",
    oracle=_Q4_ORACLE,
    doc="TPC-H Q4-shape EXISTS semi-join: count Q1-1997 orders per "
    "priority having at least one line shipped >30 days after the "
    "order date. Spark plan is a left-semi hash join on orderkey "
    "with the date predicate evaluated join-side; the quarter "
    "filter prunes orders before the shuffle, and the semi-join "
    "emits each order at most once so no post-join distinct is "
    "needed.",
    tags=("join", "semijoin", "agg"),
)
def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------
# Outer-join histogram: distribution of orders per customer
# ---------------------------------------------------------------------

_Q13_ORACLE = """
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM (
  SELECT c.c_custkey,
         CAST(coalesce(oc.n, 0) AS BIGINT) AS n_orders
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
  ) oc ON c.c_custkey = oc.o_custkey
)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


@register(
    "customer_order_distribution",
    oracle=_Q13_ORACLE,
    doc="TPC-H Q13-shape histogram of orders-per-customer including "
    "zero-order customers. Orders are aggregated to per-customer "
    "counts FIRST (one shuffle over orders, map-side partial agg), "
    "then left-joined to the customer dimension — the join input is "
    "|customers| rows, not |orders|, so the expensive side shrinks "
    "before it moves. Final histogram groupBy is over tiny "
    "cardinality.",
    tags=("join", "outerjoin", "agg"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_cust = t["orders"].groupBy("o_custkey").agg(F.count("*").alias("n"))
    hist_src = (
        t["customer"]
        .select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"))
    )
    return (
        hist_src.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# ---------------------------------------------------------------------
# Scalar subquery vs global total: high-value parts (TPC-H Q11 shape)
# ---------------------------------------------------------------------

_Q11_ORACLE = """
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice*100.0) AS BIGINT)) AS BIGINT) AS val_c
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(val_c) AS BIGINT) AS tot_c FROM pv)
SELECT l_partkey,
       round(CAST(val_c AS DOUBLE)/100.0, 2) AS part_value
FROM pv, tot
WHERE CAST(val_c AS DOUBLE) > 0.001 * CAST(tot_c AS DOUBLE)
ORDER BY part_value DESC, l_partkey ASC
"""


@register(
    "important_part_values",
    oracle=_Q11_ORACLE,
    doc="TPC-H Q11-shape scalar-subquery filter: parts whose lineitem "
    "value exceeds 0.1% of the global total. One shuffle builds the "
    "per-part aggregate; the global total is a second aggregation "
    "of that (already tiny) table and is broadcast back as a "
    "single-row cross join, so the threshold comparison never "
    "reshuffles the data. Exact fixed-point cents keep both sums "
    "order-independent.",
    tags=("agg", "scalar-subquery"),
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100.0).cast("long")
    pv = li.groupBy("l_partkey").agg(F.sum(cents).cast("long").alias("val_c"))
    tot = pv.agg(F.sum("val_c").cast("long").alias("tot_c"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val_c").cast("double") > 0.001 * F.col("tot_c").cast("double"))
        .select(
            "l_partkey",
            F.round(F.col("val_c").cast("double") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


# ---------------------------------------------------------------------
# Per-group-average threshold join (TPC-H Q17 shape)
# ---------------------------------------------------------------------

_Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity*100.0) AS BIGINT)) AS BIGINT) AS q_c,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(CAST(sum(CAST(round(l.l_extendedprice*100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0, 2) AS small_qty_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE CAST(round(l.l_quantity*100.0) AS BIGINT) < 0.5 * (CAST(pa.q_c AS DOUBLE) / pa.n)
"""


@register(
    "small_quantity_revenue",
    oracle=_Q17_ORACLE,
    doc="TPC-H Q17-shape correlated-average threshold: revenue from "
    "lines whose quantity is below half their part's average "
    "quantity. The per-part average table is one aggregation of "
    "lineitem (|parts| rows) broadcast back onto the fact scan, so "
    "the only shuffle is the partial agg — the fact table itself "
    "is never repartitioned for the comparison join. Fixed-point "
    "cents on both the average numerator and the revenue sum keep "
    "the result hash-stable.",
    tags=("join", "agg", "scalar-subquery"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    qty_c = F.round(F.col("l_quantity") * 100.0).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100.0).cast("long")
    pa = li.groupBy("l_partkey").agg(
        F.sum(qty_c).cast("long").alias("q_c"), F.count("*").alias("n")
    )
    joined = li.select(F.col("l_partkey").alias("lp"), qty_c.alias("l_q_c"), price_c.alias("l_p_c")).join(
        F.broadcast(pa), F.col("lp") == F.col("l_partkey")
    )
    small = joined.filter(
        F.col("l_q_c").cast("double")
        < 0.5 * (F.col("q_c").cast("double") / F.col("n"))
    )
    return small.agg(
        F.round(F.sum("l_p_c").cast("double") / 100.0, 2).alias("small_qty_revenue"),
        F.count("*").alias("n_lines"),
    )
