"""Advanced analytics batch 29: Wilson confidence intervals for
conversion rates and a bounded bill-of-materials subtree rollup.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Wilson 95% confidence intervals for per-day-of-week conversion
# ---------------------------------------------------------------------

_Z2 = "3.8415"  # z^2 for z = 1.96, fixed literal so both engines agree

_WILSON_ORACLE = f"""
WITH per_user_dow AS (
  SELECT user_id,
         ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7) AS dow,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events GROUP BY user_id, dow
),
g AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS k
  FROM per_user_dow GROUP BY dow
)
SELECT CAST(dow AS BIGINT) AS dow, n AS n_user_days, k AS n_converted,
       round(CAST(k AS DOUBLE) / n, 6) AS rate,
       round((CAST(k AS DOUBLE) / n + {_Z2} / (2.0 * n)
              - 1.96 * sqrt((CAST(k AS DOUBLE) / n
                             * (1.0 - CAST(k AS DOUBLE) / n)
                             + {_Z2} / (4.0 * n)) / n))
             / (1.0 + {_Z2} / n), 6) AS wilson_lo,
       round((CAST(k AS DOUBLE) / n + {_Z2} / (2.0 * n)
              + 1.96 * sqrt((CAST(k AS DOUBLE) / n
                             * (1.0 - CAST(k AS DOUBLE) / n)
                             + {_Z2} / (4.0 * n)) / n))
             / (1.0 + {_Z2} / n), 6) AS wilson_hi
FROM g
ORDER BY dow
"""


@register(
    "conversion_wilson_intervals",
    oracle=_WILSON_ORACLE,
    doc="Per-day-of-week conversion rate with Wilson 95% score "
    "intervals — the CORRECT small-sample interval (the normal "
    "approximation lies at the rates and counts product analytics "
    "actually sees; Wilson never leaves [0,1] and stays honest at "
    "k=0). The unit is a (user, dow) active day; conversion = any "
    "purchase that day. Counts are exact BIGINTs; the interval is "
    "a closed-form expression over them with identical operand "
    "order in both engines (z^2 pinned as a literal). One "
    "conditional groupBy + a 7-row rollup.",
    tags=("product", "stats"),
)
def conversion_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    dow = ((F.unix_timestamp("ts") / F.lit(86400)).cast("long") + 4) % 7
    per_user_dow = ev.groupBy("user_id", dow.alias("dow")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    g = per_user_dow.groupBy("dow").agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    p = F.col("k").cast("double") / F.col("n")
    z2 = F.lit(3.8415)
    n = F.col("n")
    center = p + z2 / (F.lit(2.0) * n)
    margin = F.lit(1.96) * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n
    )
    denom = F.lit(1.0) + z2 / n
    return g.select(
        F.col("dow").cast("long").alias("dow"),
        F.col("n").alias("n_user_days"),
        F.col("k").alias("n_converted"),
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("dow")


# ---------------------------------------------------------------------
# Bill-of-materials subtree cost rollup (bounded bottom-up tree agg)
# ---------------------------------------------------------------------

_BOM_LEVELS = 3

_BOM_ORACLE = """
WITH parts AS (
  SELECT p_partkey AS id, p_partkey // 4 AS parent,
         CAST(round(p_retailprice * 100.0) AS BIGINT) AS own_cents
  FROM part
),
-- bottom-up accumulation, 3 levels: each pass adds the summed child
-- subtotals onto the parents present in the table
r0 AS (SELECT id, parent, own_cents AS total FROM parts),
u1 AS (
  SELECT p.id, p.parent,
         p.total + COALESCE(c.s, 0) AS total
  FROM r0 p LEFT JOIN (
    SELECT parent, sum(total) AS s FROM r0 WHERE parent != id GROUP BY parent
  ) c ON c.parent = p.id
),
u2 AS (
  SELECT p.id, p.parent,
         r.own + COALESCE(c.s, 0) AS total
  FROM u1 p
  JOIN (SELECT id, own_cents AS own FROM parts) r ON r.id = p.id
  LEFT JOIN (
    SELECT parent, sum(total) AS s FROM u1 WHERE parent != id GROUP BY parent
  ) c ON c.parent = p.id
),
u3 AS (
  SELECT p.id, p.parent,
         r.own + COALESCE(c.s, 0) AS total
  FROM u2 p
  JOIN (SELECT id, own_cents AS own FROM parts) r ON r.id = p.id
  LEFT JOIN (
    SELECT parent, sum(total) AS s FROM u2 WHERE parent != id GROUP BY parent
  ) c ON c.parent = p.id
)
SELECT CAST(id AS BIGINT) AS part_id,
       round(CAST(total AS DOUBLE) / 100.0, 2) AS subtree_cost
FROM u3
ORDER BY total DESC, id ASC
LIMIT 20
"""


@register(
    "bom_cost_rollup",
    oracle=_BOM_ORACLE,
    doc="Bill-of-materials subtree cost rollup over a synthetic 4-ary "
    "part hierarchy (parent = partkey DIV 4): three bottom-up "
    "passes, each one join + groupBy, accumulate every node's "
    "3-level subtree cost — the bounded tree aggregation "
    "(org charts, category trees, BOMs) that SQL recursion "
    "expresses top-down and Spark expresses as iterated "
    "child-sum joins (same shape as the BFS/Katz frontier loops, "
    "aimed down the tree instead of out the graph). Each pass "
    "re-anchors on the node's OWN cost plus its children's "
    "CURRENT subtotals, so after k passes a node holds exactly "
    "its depth-k subtree — the oracle replays the same three "
    "passes. All cents BIGINT.",
    tags=("join", "graph"),
)
def bom_cost_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir)["part"]
    parts = part.select(
        F.col("p_partkey").alias("id"),
        F.expr("p_partkey DIV 4").alias("parent"),
        F.round(F.col("p_retailprice") * 100.0).cast("long").alias("own_cents"),
    ).cache()
    base = parts.select(
        F.col("id"), F.col("parent"), F.col("own_cents").alias("own")
    )
    cur = base.select("id", "parent", F.col("own").alias("total"))
    for _ in range(_BOM_LEVELS):
        child_sums = (
            cur.filter(F.col("parent") != F.col("id"))
            .groupBy(F.col("parent").alias("cs_parent"))
            .agg(F.sum("total").alias("s"))
        )
        cur = (
            base.join(child_sums, base["id"] == child_sums["cs_parent"], "left")
            .select(
                base["id"].alias("id"),
                base["parent"].alias("parent"),
                (base["own"] + F.coalesce(F.col("s"), F.lit(0))).alias("total"),
            )
        )
    return (
        cur.orderBy(F.col("total").desc(), F.col("id").asc())
        .limit(20)
        .select(
            F.col("id").alias("part_id"),
            F.round(F.col("total").cast("double") / 100.0, 2).alias(
                "subtree_cost"
            ),
        )
    )
