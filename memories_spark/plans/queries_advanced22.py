"""Advanced analytics batch 26: Borůvka minimum-spanning-forest
rounds and CBO-style join cardinality estimation.

Determinism contract as per the registry module docstring. Borůvka
edge picks use a totally-ordered key (weight, ea, eb) so the chosen
forest is unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.queries_graph import _TRI_EDGES_CTE, _shifted_edges
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Borůvka MST: one round of min-edge selection + component merge
# ---------------------------------------------------------------------

_BORUVKA_ORACLE = f"""
WITH edges AS MATERIALIZED (
  SELECT ea, eb, 1 + (ea + eb) % 97 AS w
  FROM ({_TRI_EDGES_CTE})
),
bidir AS MATERIALIZED (
  SELECT ea AS a, eb AS b, w, ea AS oa, eb AS ob FROM edges
  UNION ALL
  SELECT eb AS a, ea AS b, w, ea AS oa, eb AS ob FROM edges
),
-- round 1: every node picks its minimum incident edge (ties by
-- (w, oa, ob)); the union of picks is a spanning forest fragment set
picks AS MATERIALIZED (
  SELECT DISTINCT oa, ob, w FROM (
    SELECT a, oa, ob, w,
           row_number() OVER (PARTITION BY a ORDER BY w, oa, ob) AS rk
    FROM bidir
  ) WHERE rk = 1
),
-- components after round 1: min-label propagation over picked edges
-- (3 rounds is enough: Boruvka fragments have diameter <= ~log n here)
adj AS MATERIALIZED (
  SELECT oa AS f, ob AS t FROM picks UNION ALL SELECT ob, oa FROM picks
),
l0 AS (SELECT DISTINCT a AS id FROM bidir),
l0x AS (SELECT id, id AS lbl FROM l0),
l1 AS MATERIALIZED (
  SELECT l.id, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l0x l LEFT JOIN adj ON adj.t = l.id LEFT JOIN l0x n ON n.id = adj.f
  GROUP BY l.id, l.lbl
),
l2 AS MATERIALIZED (
  SELECT l.id, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l1 l LEFT JOIN adj ON adj.t = l.id LEFT JOIN l1 n ON n.id = adj.f
  GROUP BY l.id, l.lbl
),
l3 AS MATERIALIZED (
  SELECT l.id, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l2 l LEFT JOIN adj ON adj.t = l.id LEFT JOIN l2 n ON n.id = adj.f
  GROUP BY l.id, l.lbl
),
l4 AS MATERIALIZED (
  SELECT l.id, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l3 l LEFT JOIN adj ON adj.t = l.id LEFT JOIN l3 n ON n.id = adj.f
  GROUP BY l.id, l.lbl
),
l5 AS MATERIALIZED (
  SELECT l.id, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l4 l LEFT JOIN adj ON adj.t = l.id LEFT JOIN l4 n ON n.id = adj.f
  GROUP BY l.id, l.lbl
),
l6 AS MATERIALIZED (
  SELECT l.id, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l5 l LEFT JOIN adj ON adj.t = l.id LEFT JOIN l5 n ON n.id = adj.f
  GROUP BY l.id, l.lbl
)
SELECT CAST((SELECT count(*) FROM picks) AS BIGINT) AS forest_edges,
       CAST((SELECT sum(w) FROM picks) AS BIGINT) AS forest_weight,
       CAST((SELECT count(DISTINCT lbl) FROM l6) AS BIGINT)
         AS components_after,
       CAST((SELECT count(*) FROM l0) AS BIGINT) AS n_nodes
"""


@register(
    "boruvka_mst_round",
    oracle=_BORUVKA_ORACLE,
    doc="One Borůvka round of minimum-spanning-forest construction "
    "over the weighted chain+shortcut graph: every node picks its "
    "cheapest incident edge under a TOTAL order (w, ea, eb) so the "
    "forest is unique (classic Borůvka needs distinct weights; the "
    "lexicographic tie-break supplies that), picks are deduped "
    "(both endpoints choosing the same edge counts once), and the "
    "resulting fragments are counted by bounded min-label "
    "propagation. Borůvka is THE distributed MST algorithm "
    "precisely because each round is a per-node argmin (one "
    "window or min-groupBy) + a CC pass — log n rounds total, "
    "each a constant number of shuffles, no priority queue. "
    "Output: forest size/weight and the component count the next "
    "round would start from.",
    tags=("graph",),
)
def boruvka_mst_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id")
    edges = (
        _shifted_edges(ids, 20)
        .unionByName(_shifted_edges(ids, 40))
        .select("ea", "eb", (1 + (F.col("ea") + F.col("eb")) % 97).alias("w"))
    )
    bidir = edges.select(
        F.col("ea").alias("a"), "w", F.col("ea").alias("oa"), F.col("eb").alias("ob")
    ).unionByName(
        edges.select(
            F.col("eb").alias("a"), "w", F.col("ea").alias("oa"), F.col("eb").alias("ob")
        )
    )
    wpick = Window.partitionBy("a").orderBy("w", "oa", "ob")
    picks = (
        bidir.withColumn("rk", F.row_number().over(wpick))
        .filter(F.col("rk") == 1)
        .select("oa", "ob", "w")
        .distinct()
        .cache()
    )
    from memories_spark.operators.graph import min_label_propagation

    nodes = bidir.select(F.col("a").alias("id")).distinct()
    labels = min_label_propagation(
        picks.select(F.col("oa").alias("from_id"), F.col("ob").alias("to_id")),
        nodes,
        rounds=6,
    )
    stats = picks.agg(
        F.count("*").alias("forest_edges"), F.sum("w").alias("forest_weight")
    )
    comp = labels.agg(F.countDistinct("label").alias("components_after"))
    n = nodes.agg(F.count("*").alias("n_nodes"))
    return (
        stats.crossJoin(F.broadcast(comp))
        .crossJoin(F.broadcast(n))
        .select("forest_edges", "forest_weight", "components_after", "n_nodes")
    )


# ---------------------------------------------------------------------
# Join cardinality estimation audit (MCV histogram vs actual)
# ---------------------------------------------------------------------

_MCV = 20

_CARD_ORACLE = f"""
WITH la AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY l_orderkey),
ob AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
            FROM orders GROUP BY o_orderkey),
mcv AS (
  SELECT k, c, row_number() OVER (ORDER BY c DESC, k ASC) AS rk
  FROM la QUALIFY rk <= {_MCV}
),
mcv_part AS (
  SELECT CAST(sum(m.c * o.c) AS BIGINT) AS est
  FROM mcv m JOIN ob o ON m.k = o.k
),
tails AS (
  SELECT CAST(sum(c) AS BIGINT) AS tail_rows,
         CAST(count(*) AS BIGINT) AS tail_keys
  FROM la WHERE k NOT IN (SELECT k FROM mcv)
),
tail_match AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ob
  WHERE k NOT IN (SELECT k FROM mcv)
),
actual AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT a.n AS actual_rows,
       CAST(m.est + CASE WHEN t.tail_keys > 0
            THEN tm.n * (t.tail_rows // t.tail_keys) ELSE 0 END AS BIGINT)
         AS estimated_rows,
       round(abs(CAST(m.est + CASE WHEN t.tail_keys > 0
             THEN tm.n * (t.tail_rows // t.tail_keys) ELSE 0 END AS DOUBLE)
             - a.n) / a.n, 6) AS rel_error
FROM actual a, mcv_part m, tails t, tail_match tm
"""


@register(
    "join_cardinality_estimate",
    oracle=_CARD_ORACLE,
    doc="Cost-based-optimizer homework, run as a query: estimate "
    "|lineitem JOIN orders| from a 20-bucket most-common-values "
    "histogram (exact counts for the heavy keys, uniform-average "
    "assumption for the tail — the classic MCV+uniform estimator "
    "every CBO carries) and audit it against the true join "
    "cardinality. On this foreign-key join the estimate is nearly "
    "exact, and THAT is the point: the query quantifies estimator "
    "error, which is the number that decides broadcast-vs-shuffle "
    "planning at 100 TB. Tail estimate uses integer division "
    "(floor average multiplicity) to stay engine-exact.",
    tags=("ops", "stats"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    la = t["lineitem"].groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    ob = t["orders"].groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy(F.col("c").desc(), F.col("k").asc())
    mcv = (
        la.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MCV)
        .select("k", "c")
        .cache()
    )
    mcv_part = (
        mcv.join(ob.withColumnRenamed("c", "oc"), "k")
        .agg(F.sum(F.col("c") * F.col("oc")).alias("est"))
    )
    tails = la.join(mcv.select("k"), "k", "left_anti").agg(
        F.sum("c").alias("tail_rows"), F.count("*").alias("tail_keys")
    )
    tail_match = ob.join(mcv.select("k"), "k", "left_anti").agg(
        F.count("*").alias("n_tail_match")
    )
    actual = (
        t["lineitem"]
        .join(
            t["orders"],
            t["lineitem"]["l_orderkey"] == t["orders"]["o_orderkey"],
        )
        .agg(F.count("*").alias("actual_rows"))
    )
    est = F.col("est") + F.when(
        F.col("tail_keys") > 0,
        F.col("n_tail_match")
        * F.expr("tail_rows DIV tail_keys"),
    ).otherwise(0)
    return (
        actual.crossJoin(F.broadcast(mcv_part))
        .crossJoin(F.broadcast(tails))
        .crossJoin(F.broadcast(tail_match))
        .select(
            "actual_rows",
            est.cast("long").alias("estimated_rows"),
            F.round(
                F.abs(est.cast("double") - F.col("actual_rows"))
                / F.col("actual_rows"),
                6,
            ).alias("rel_error"),
        )
    )
