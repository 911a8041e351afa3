"""Trained-centroid IVF approximate nearest neighbors (nprobe=3).

Completes the ANN family (brute force -> hash-bucketed IVF ->
multi-probe LSH) with the real IVF structure: data-dependent
centroids, a partition-assignment build pass, and multi-cell probing
at query time — the FAISS-style layout that scales vector search
past the point where hashing alone keeps recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_DIM = 64
# Deterministic "trained" centroids: a fixed spread of corpus vectors
# (ids valid at every SF). In production these come from a k-means
# sample job; freezing them keeps the oracle replayable — swapping in
# trained centroids changes one list.
_CENTROID_IDS = [7 + 30 * i for i in range(16)]
_NPROBE = 3

_CENT_LIST = ", ".join(str(i) for i in _CENTROID_IDS)

_IVF_TRAINED_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id IN ({_CENT_LIST})
),
assign AS (
  SELECT vec_id, embedding, cid AS cell FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({cosine_sql('e.embedding', 'c.cv', _DIM)}, 9) DESC, c.cid ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT cid AS probe_cell, qv FROM (
    SELECT c.cid, q.embedding AS qv,
           row_number() OVER (
             ORDER BY round({cosine_sql('q.embedding', 'c.cv', _DIM)}, 9) DESC, c.cid ASC
           ) AS rn
    FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) q CROSS JOIN cents c
  ) WHERE rn <= {_NPROBE}
),
scored AS (
  SELECT a.vec_id, round({cosine_sql('a.embedding', 'p.qv', _DIM)}, 6) AS sim
  FROM assign a JOIN qprobe p ON a.cell = p.probe_cell
  WHERE a.vec_id != 0
)
SELECT vec_id, sim,
       CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
FROM scored
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""


@register(
    "ann_ivf_trained",
    oracle=_IVF_TRAINED_ORACLE,
    bench=True,
    doc="IVF with trained centroids and nprobe=3: a build pass assigns "
    "every corpus vector to its nearest of 16 centroids (broadcast "
    "centroid table, argmax window per vector — at 100 TB this is "
    "the one-off index build, persisted partitioned BY cell so "
    "probes become partition pruning); at query time the 3 nearest "
    "centroid cells are probed with exact cosine inside. Candidates "
    "~= nprobe/K of the corpus; recall measured against brute force "
    "in tests/test_ann_recall.py. Centroids here are a fixed "
    "deterministic spread standing in for a k-means sample job "
    "(reference R1/J2 at scale, SURVEY §4 'custom work' item 1).",
    tags=("vector", "ann"),
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )

    aw = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(cosine_expr("embedding", "cv"), 9)), F.asc("cid")
    )
    assign = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("cell"))
    )

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    qw = Window.orderBy(
        F.desc(F.round(cosine_expr("qv", "cv"), 9)), F.asc("cid")
    )
    qprobe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _NPROBE)
        .select(F.col("cid").alias("probe_cell"), "qv")
    )

    scored = (
        assign.join(F.broadcast(qprobe), F.col("cell") == F.col("probe_cell"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim"))
    )
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .orderBy(F.desc("sim"), F.asc("vec_id"))
    )
