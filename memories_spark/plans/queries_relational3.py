"""Relational coverage, batch 3: CUBE grouping, multi-fact star
joins, HAVING-backed semi-joins and per-group top-k windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# CUBE over events: all grouping-set combinations in one pass
# ---------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(CAST(user_bucket AS VARCHAR), '(all)') AS user_bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(CAST(round(value*100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0, 2) AS total_value
FROM (SELECT event_type, user_id % 4 AS user_bucket, value FROM events)
GROUP BY CUBE (event_type, user_bucket)
ORDER BY event_type, user_bucket
"""


@register(
    "events_cube",
    oracle=_CUBE_ORACLE,
    doc="Full CUBE over (event_type, user bucket): all four grouping "
    "sets computed in ONE Expand + hash-aggregate pass instead of "
    "four scans — completes the grouping-sets family next to the "
    "ROLLUP query. NULL grouping slots are surfaced as '(all)' so "
    "the result is string-typed and hash-stable across engines.",
    tags=("agg", "cube", "events"),
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    src = ev.select(
        "event_type", (F.col("user_id") % 4).alias("user_bucket"), "value"
    )
    cents = F.round(F.col("value") * 100.0).cast("long")
    return (
        src.cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("_c"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("user_bucket").cast("string"), F.lit("(all)")).alias(
                "user_bucket"
            ),
            "n",
            F.round(F.col("_c").cast("double") / 100.0, 2).alias("total_value"),
        )
        .orderBy("event_type", "user_bucket")
    )


# ---------------------------------------------------------------------
# Multi-fact star join: revenue by supplier nation and order year
# ---------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(CAST(sum(CAST(round((l.l_extendedprice*(1.0-l.l_discount))*100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0, 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year
"""


@register(
    "nation_year_profit",
    oracle=_Q9_ORACLE,
    bench=True,
    doc="TPC-H Q9-shape profit rollup: lineitem x orders on orderkey "
    "(the one unavoidable big-to-big shuffle) with supplier and "
    "nation as broadcast dims, grouped by (nation, order year). "
    "The broadcast keeps the dimension lookups out of the shuffle "
    "entirely; AQE can coalesce the fact-join partitions at 100 TB.",
    tags=("join", "agg", "star"),
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    cents = F.round(disc_price * 100.0).cast("long")
    joined = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(cents).alias("_c"))
        .select(
            "nation",
            "o_year",
            F.round(F.col("_c").cast("double") / 100.0, 2).alias("revenue"),
        )
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------
# HAVING-backed semi-join: customers with at least one jumbo order
# ---------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity*100.0) AS BIGINT)) AS BIGINT) AS q_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity*100.0) AS BIGINT)) > 20000
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(CAST(b.q_c AS DOUBLE)/100.0, 2) AS total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY total_qty DESC, o.o_orderkey ASC
LIMIT 100
"""


@register(
    "large_order_customers",
    oracle=_Q18_ORACLE,
    doc="TPC-H Q18-shape: orders whose total line quantity exceeds a "
    "threshold, enriched with their customer. The HAVING aggregate "
    "shrinks lineitem to a handful of qualifying orderkeys BEFORE "
    "any join — the join inputs are |qualifying orders| rows, so "
    "both enrichment joins broadcast. Top-100 with full tie-break.",
    tags=("join", "having", "topk"),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    qty_c = F.round(F.col("l_quantity") * 100.0).cast("long")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("q_c"))
        .filter(F.col("q_c") > 20000)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("q_c").cast("double") / 100.0, 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------
# Per-group top-k window: best parts per brand by retail price
# ---------------------------------------------------------------------

_TOPPER_ORACLE = """
SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
)
WHERE rn <= 2
ORDER BY p_brand, rank
"""


@register(
    "top_parts_per_brand",
    oracle=_TOPPER_ORACLE,
    doc="Per-group top-k (top-2 parts by retail price per brand): the "
    "row_number window shuffles once on the group key and Spark "
    "applies the rank<=k filter inside the window operator "
    "(WindowGroupLimit pushdown in recent Sparks), so per-group "
    "state never exceeds k rows — the grouped twin of "
    "TakeOrderedAndProject.",
    tags=("window", "topk"),
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir)["part"]
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .select(
            "p_brand", "p_partkey", "p_name", "p_retailprice",
            F.col("rn").cast("long").alias("rank"),
        )
        .orderBy("p_brand", "rank")
    )
