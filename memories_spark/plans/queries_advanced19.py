"""Advanced analytics batch 23: density clustering (DBSCAN-style
cores over LSH-blocked similarity) and kNN label-noise detection.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.operators import graph as graph_op
from memories_spark.operators import similarity as sim_op
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_DIM = 64
_PLANES = 4
_EPS_SIM = 0.3   # neighbor iff cosine >= eps
_MIN_NBRS = 2    # core iff >= 2 blocked neighbors
_CC_ROUNDS = 6

_PAIRS_CTE = f"""
bucketed AS MATERIALIZED (
  SELECT vec_id, embedding,
         {sim_op.lsh_bucket_sql('embedding', _DIM, _PLANES)} AS b
  FROM embeddings
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b ON a.b = b.b AND a.vec_id < b.vec_id
  WHERE round({cosine_sql('a.embedding', 'b.embedding', _DIM)}, 6)
        >= {_EPS_SIM}
),
deg AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
  ) GROUP BY id
),
cores AS MATERIALIZED (SELECT id FROM deg WHERE d >= {_MIN_NBRS}),
core_edges AS MATERIALIZED (
  SELECT p.id_a AS from_id, p.id_b AS to_id
  FROM pairs p
  JOIN cores ca ON ca.id = p.id_a
  JOIN cores cb ON cb.id = p.id_b
)
"""

_DBSCAN_ORACLE = (
    graph_op.label_propagation_sql(
        f"WITH {_PAIRS_CTE} SELECT from_id, to_id FROM core_edges",
        f"WITH {_PAIRS_CTE} SELECT id FROM cores",
        _CC_ROUNDS,
    )
    + """
SELECT CAST(label AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n_core,
       CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
FROM labels
GROUP BY label
HAVING count(*) >= 2
ORDER BY cluster
"""
)


@register(
    "dbscan_core_clusters",
    oracle=_DBSCAN_ORACLE,
    doc="DBSCAN-style density clustering over the embedding corpus: "
    "neighbors are LSH-blocked cosine pairs (sim >= 0.3 within a "
    "sign-projection bucket — the sub-quadratic candidate "
    "generation shared with embedding_near_dups), CORE points "
    "have >= 2 such neighbors, and clusters are connected "
    "components of the core-core graph (bounded min-label "
    "propagation, operators/graph.min_label_propagation). "
    "Border/noise points are everything outside — exactly "
    "DBSCAN's partition, restated as three composable relational "
    "stages: similarity join -> degree filter -> CC. Every stage "
    "is a shape this engine already scales (blocked pair join, "
    "groupBy degree, Pregel label rounds); the composition is the "
    "new capability.",
    tags=("similarity", "dedup", "graph"),
)
def dbscan_core_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    pairs = sim_op.cosine_pairs_blocked(
        emb,
        threshold=_EPS_SIM,
        block_col=sim_op.lsh_bucket_expr("embedding", _DIM, _PLANES),
    ).select(F.col("id_a"), F.col("id_b"))
    deg = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    cores = deg.filter(F.col("d") >= _MIN_NBRS).select("id").cache()
    core_edges = (
        pairs.join(cores.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(cores.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
        .select(F.col("id_a").alias("from_id"), F.col("id_b").alias("to_id"))
    )
    labels = graph_op.min_label_propagation(core_edges, cores, _CC_ROUNDS)
    return (
        labels.groupBy(F.col("label").alias("cluster"))
        .agg(
            F.count("*").alias("n_core"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .filter(F.col("n_core") >= 2)
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------
# kNN label-noise detection (neighborhood voting)
# ---------------------------------------------------------------------

_KNN_K = 5

_LABEL_NOISE_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, a.label AS own_label,
         b.vec_id AS nid, b.label AS n_label,
         round({cosine_sql('a.embedding', 'b.embedding', _DIM)}, 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
),
topk AS (
  SELECT qid, own_label, n_label,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
  FROM pairs QUALIFY rk <= {_KNN_K}
),
votes AS (
  SELECT qid, own_label, n_label, CAST(count(*) AS BIGINT) AS v
  FROM topk GROUP BY qid, own_label, n_label
),
winner AS (
  SELECT qid, own_label, n_label AS majority_label, v,
         row_number() OVER (PARTITION BY qid ORDER BY v DESC, n_label ASC)
           AS rk
  FROM votes QUALIFY rk = 1
)
SELECT qid AS vec_id, CAST(own_label AS BIGINT) AS own_label,
       CAST(majority_label AS BIGINT) AS majority_label,
       v AS majority_votes
FROM winner
WHERE majority_label != own_label AND v >= 3
ORDER BY vec_id
"""


@register(
    "knn_label_disagreement",
    oracle=_LABEL_NOISE_ORACLE,
    doc="Label-noise screening by neighborhood voting: each labeled "
    "embedding is flagged when >= 3 of its 5 nearest cosine "
    "neighbors agree on a DIFFERENT label — the confident-learning "
    "style audit run before training on labeled data (mislabeled "
    "examples dominate loss late in training; catching them is a "
    "data-pipeline job, not a model job). Top-5 per query via one "
    "partitioned window over the pair scores, majority via a "
    "count + rank with deterministic tie-breaks. The all-pairs "
    "join is the exact baseline; at corpus scale the pair stage "
    "swaps for the LSH-blocked candidates (same downstream "
    "voting), which is the ann-family trade this repo already "
    "quantifies.",
    tags=("similarity", "quality", "training"),
)
def knn_label_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    a = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("own_label"),
        F.col("embedding").alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("eb"),
    )
    pairs = a.join(b, F.col("qid") != F.col("nid")).select(
        "qid",
        "own_label",
        "nid",
        "n_label",
        F.round(cosine_expr("ea", "eb"), 6).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    topk = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
    )
    votes = topk.groupBy("qid", "own_label", "n_label").agg(
        F.count("*").alias("v")
    )
    ww = Window.partitionBy("qid").orderBy(F.desc("v"), F.asc("n_label"))
    winner = (
        votes.withColumn("rk", F.row_number().over(ww))
        .filter(F.col("rk") == 1)
    )
    return (
        winner.filter(
            (F.col("n_label") != F.col("own_label")) & (F.col("v") >= 3)
        )
        .select(
            F.col("qid").alias("vec_id"),
            F.col("own_label").cast("long").alias("own_label"),
            F.col("n_label").cast("long").alias("majority_label"),
            F.col("v").alias("majority_votes"),
        )
        .orderBy("vec_id")
    )
