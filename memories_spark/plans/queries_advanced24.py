"""Advanced analytics batch 28: retrieval evaluation metrics
(P@10, MRR, nDCG@10) with label-derived relevance.

Determinism contract as per the registry module docstring: DCG terms
freeze to fixed point, ranks break ties by vec_id, and nDCG divides
two integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_DIM = 64
_QUERY_IDS = (0, 1, 2, 3)
_K = 10

_QIDS = ", ".join(str(q) for q in _QUERY_IDS)

_EVAL_ORACLE = f"""
WITH queries AS (
  SELECT vec_id AS qid, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id IN ({_QIDS})
),
ranked AS (
  SELECT q.qid, e.vec_id,
         CAST(CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS BIGINT)
           AS rel,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY round({cosine_sql('e.embedding', 'q.qv', _DIM)}, 9) DESC,
                    e.vec_id ASC) AS rk
  FROM embeddings e JOIN queries q ON e.vec_id != q.qid
),
rtotals AS (
  SELECT qid, CAST(sum(rel) AS BIGINT) AS n_relevant FROM ranked GROUP BY qid
),
metrics AS (
  SELECT r.qid,
         CAST(sum(CASE WHEN r.rk <= {_K} THEN r.rel ELSE 0 END) AS BIGINT)
           AS hits_at_k,
         CAST(min(CASE WHEN r.rel = 1 THEN r.rk END) AS BIGINT)
           AS first_rel_rank,
         CAST(sum(CASE WHEN r.rk <= {_K} AND r.rel = 1
                  THEN CAST(round(1e12 / (ln(r.rk + 1) / ln(2.0))) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS dcg_fp
  FROM ranked r GROUP BY r.qid
),
ideal AS (
  SELECT t.qid,
         CAST(sum(CASE WHEN i.i <= least(t.n_relevant, {_K})
                  THEN CAST(round(1e12 / (ln(i.i + 1) / ln(2.0))) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS idcg_fp
  FROM rtotals t, (SELECT unnest(generate_series(1, {_K})) AS i) i
  GROUP BY t.qid
)
SELECT m.qid AS query_id,
       round(CAST(m.hits_at_k AS DOUBLE) / {_K}, 6) AS p_at_10,
       round(1.0 / m.first_rel_rank, 6) AS mrr,
       round(CAST(m.dcg_fp AS DOUBLE) / i.idcg_fp, 6) AS ndcg_at_10
FROM metrics m JOIN ideal i ON m.qid = i.qid
ORDER BY query_id
"""


@register(
    "retrieval_eval_metrics",
    oracle=_EVAL_ORACLE,
    doc="The retrieval-evaluation suite as one query: for each of 4 "
    "query vectors, rank the corpus by exact cosine and score "
    "Precision@10, MRR, and nDCG@10 against label-derived "
    "relevance (a hit is relevant iff it shares the query's "
    "label) — the harness behind the reference's R@5=98.3% "
    "LongMemEval claim (BASELINE.md), restated so the metrics "
    "are oracle-checkable. Each DCG term 1/log2(rank+1) freezes "
    "to fixed point, so DCG and the ideal DCG are integer sums "
    "and nDCG is their exact ratio; cosine ranks tie-break by "
    "vec_id. One partitioned window over the scored pairs; the "
    "4-query panel broadcasts. Swap the exact ranker for any ANN "
    "query in this registry and the same harness measures ITS "
    "quality — that is how the ann_* recall numbers generalize "
    "to graded metrics.",
    tags=("retrieval", "stats", "ann"),
)
def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    ranked = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .cast("long")
            .alias("rel"),
            F.round(cosine_expr("embedding", "qv"), 9).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("sim").desc(), F.col("vec_id").asc()
                )
            ),
        )
    )
    dcg_term = F.round(F.lit(1e12) / (F.log(F.col("rk") + 1) / F.log(F.lit(2.0)))).cast(
        "long"
    )
    metrics = ranked.groupBy("qid").agg(
        F.sum(F.when(F.col("rk") <= _K, F.col("rel")).otherwise(0)).alias(
            "hits_at_k"
        ),
        F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("first_rel_rank"),
        F.sum(
            F.when((F.col("rk") <= _K) & (F.col("rel") == 1), dcg_term).otherwise(
                0
            )
        ).alias("dcg_fp"),
        F.sum("rel").alias("n_relevant"),
    )
    ranks = spark.range(1, _K + 1).select(F.col("id").alias("i"))
    ideal_term = F.round(
        F.lit(1e12) / (F.log(F.col("i") + 1) / F.log(F.lit(2.0)))
    ).cast("long")
    ideal = (
        metrics.select("qid", "n_relevant")
        .crossJoin(F.broadcast(ranks))
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(
                    F.col("i") <= F.least(F.col("n_relevant"), F.lit(_K)),
                    ideal_term,
                ).otherwise(0)
            ).alias("idcg_fp")
        )
    )
    return (
        metrics.join(ideal, "qid")
        .select(
            F.col("qid").alias("query_id"),
            F.round(F.col("hits_at_k").cast("double") / _K, 6).alias("p_at_10"),
            F.round(F.lit(1.0) / F.col("first_rel_rank"), 6).alias("mrr"),
            F.round(
                F.col("dcg_fp").cast("double") / F.col("idcg_fp"), 6
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )
