"""Advanced analytics batch 31: exact Shapley-value channel
attribution (3-player closed form) and intra-list diversity audit of
retrieval results.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Shapley channel attribution over touch coalitions
# ---------------------------------------------------------------------
#
# Channels: view (bit 1), click (bit 2), signup (bit 4). Coalition
# value v(S) = conversion rate among users whose touched-channel set
# is exactly S (0 when no user has that set). With 3 players Shapley
# weights are closed-form: marginal over |S|=0 and |S|=2 coalitions
# weigh 1/3, over |S|=1 coalitions 1/6.

_SHAPLEY_ORACLE = """
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            + max(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
            + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
            AS BIGINT) AS mask,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS conv
  FROM events GROUP BY user_id
),
m AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS k
  FROM users GROUP BY mask
),
v AS (
  SELECT s.mask,
         COALESCE(CAST(m.k AS DOUBLE) / nullif(m.n, 0), 0.0) AS val
  FROM (SELECT unnest(generate_series(0, 7)) AS mask) s
  LEFT JOIN m ON m.mask = s.mask
),
pivoted AS (
  SELECT
    max(CASE WHEN mask = 0 THEN val END) AS v0,
    max(CASE WHEN mask = 1 THEN val END) AS v1,
    max(CASE WHEN mask = 2 THEN val END) AS v2,
    max(CASE WHEN mask = 3 THEN val END) AS v3,
    max(CASE WHEN mask = 4 THEN val END) AS v4,
    max(CASE WHEN mask = 5 THEN val END) AS v5,
    max(CASE WHEN mask = 6 THEN val END) AS v6,
    max(CASE WHEN mask = 7 THEN val END) AS v7
  FROM v
)
SELECT channel, round(shapley, 6) AS shapley FROM (
  SELECT 'view' AS channel,
         (v1 - v0) / 3.0 + (v3 - v2) / 6.0 + (v5 - v4) / 6.0
         + (v7 - v6) / 3.0 AS shapley
  FROM pivoted
  UNION ALL
  SELECT 'click',
         (v2 - v0) / 3.0 + (v3 - v1) / 6.0 + (v6 - v4) / 6.0
         + (v7 - v5) / 3.0
  FROM pivoted
  UNION ALL
  SELECT 'signup',
         (v4 - v0) / 3.0 + (v5 - v1) / 6.0 + (v6 - v2) / 6.0
         + (v7 - v3) / 3.0
  FROM pivoted
)
ORDER BY channel
"""


@register(
    "shapley_channel_attribution",
    oracle=_SHAPLEY_ORACLE,
    doc="Exact Shapley-value attribution over the three non-purchase "
    "channels: users collapse to an 8-cell coalition table (which "
    "channel subsets they touched x conversion rate), and each "
    "channel's Shapley value is the closed-form weighted sum of "
    "its marginal contributions ((2-|S|)-weighted: 1/3 for empty "
    "and 2-sets, 1/6 for singletons) — the game-theoretic "
    "attribution that linear/first-touch/time-decay schemes "
    "(first_touch_attribution, multi_touch_attribution) "
    "approximate. With k channels the coalition table has 2^k "
    "rows, so the heavy work is ONE per-user conditional groupBy; "
    "the Shapley algebra runs on 8 numbers. Coalition rates are "
    "exact integer ratios; identical expression order both "
    "engines.",
    tags=("product", "attribution", "stats"),
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    users = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            + F.max(F.when(F.col("event_type") == "click", 2).otherwise(0))
            + F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0))
        ).alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    m = users.groupBy("mask").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    spine = spark.range(0, 8).select(F.col("id").cast("long").alias("mask"))
    v = spine.join(m, "mask", "left").select(
        "mask",
        F.coalesce(
            F.col("k").cast("double") / F.nullif(F.col("n"), F.lit(0)),
            F.lit(0.0),
        ).alias("val"),
    )
    pivoted = v.groupBy().agg(
        *[
            F.max(F.when(F.col("mask") == i, F.col("val"))).alias(f"v{i}")
            for i in range(8)
        ]
    )
    c = lambda i: F.col(f"v{i}")  # noqa: E731
    shap = {
        "view": (c(1) - c(0)) / 3.0 + (c(3) - c(2)) / 6.0
        + (c(5) - c(4)) / 6.0 + (c(7) - c(6)) / 3.0,
        "click": (c(2) - c(0)) / 3.0 + (c(3) - c(1)) / 6.0
        + (c(6) - c(4)) / 6.0 + (c(7) - c(5)) / 3.0,
        "signup": (c(4) - c(0)) / 3.0 + (c(5) - c(1)) / 6.0
        + (c(6) - c(2)) / 6.0 + (c(7) - c(3)) / 3.0,
    }
    out = None
    for name, expr in shap.items():
        row = pivoted.select(
            F.lit(name).alias("channel"), F.round(expr, 6).alias("shapley")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("channel")


# ---------------------------------------------------------------------
# Intra-list diversity audit of retrieval results
# ---------------------------------------------------------------------

_DIM = 64
_ILD_K = 10

_ILD_ORACLE = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
ranked AS (
  SELECT e.vec_id, e.embedding,
         row_number() OVER (
           ORDER BY round({cosine_sql('e.embedding', 'q.embedding', _DIM)}, 9)
                    DESC, e.vec_id ASC) AS rk
  FROM embeddings e, q WHERE e.vec_id != 0
),
head AS (SELECT vec_id, embedding FROM ranked WHERE rk <= {_ILD_K}),
tail AS (SELECT vec_id, embedding FROM ranked
         WHERE rk > (SELECT max(rk) FROM ranked) - {_ILD_K}),
hp AS (
  SELECT CAST(round((1.0 - {cosine_sql('a.embedding', 'b.embedding', _DIM)})
              * 1e9) AS BIGINT) AS d_fp
  FROM head a JOIN head b ON a.vec_id < b.vec_id
),
tp AS (
  SELECT CAST(round((1.0 - {cosine_sql('a.embedding', 'b.embedding', _DIM)})
              * 1e9) AS BIGINT) AS d_fp
  FROM tail a JOIN tail b ON a.vec_id < b.vec_id
)
SELECT list_name, n_pairs, round(avg_d, 6) AS avg_distance FROM (
  SELECT 'top10' AS list_name, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(d_fp) AS DOUBLE) / count(*) / 1e9 AS avg_d
  FROM hp
  UNION ALL
  SELECT 'bottom10', CAST(count(*) AS BIGINT),
         CAST(sum(d_fp) AS DOUBLE) / count(*) / 1e9
  FROM tp
)
ORDER BY list_name
"""


@register(
    "intralist_diversity_audit",
    oracle=_ILD_ORACLE,
    doc="Intra-list diversity (mean pairwise cosine DISTANCE) of the "
    "query's top-10 result list, contrasted with the bottom-10 of "
    "the same ranking — the metric that quantifies what "
    "mmr_diverse_rerank trades relevance FOR (a redundant top-10 "
    "has low ILD; MMR raises it). Pairwise distances freeze to "
    "fixed point before averaging; both lists come from ONE "
    "ranking pass and the pair joins touch only 10-row tables, so "
    "the audit costs O(k^2) regardless of corpus size.",
    tags=("retrieval", "similarity", "stats"),
)
def intralist_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    ranked = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(cosine_expr("embedding", "qv"), 9).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            ),
        )
        .cache()
    )
    n = ranked.agg(F.max("rk").alias("mx"))

    def ild(df: DataFrame, name: str) -> DataFrame:
        a = df.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
        b = df.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
        pairs = a.join(b, F.col("ia") < F.col("ib")).select(
            F.round((F.lit(1.0) - cosine_expr("ea", "eb")) * F.lit(1e9))
            .cast("long")
            .alias("d_fp")
        )
        return pairs.agg(
            F.lit(name).alias("list_name"),
            F.count("*").alias("n_pairs"),
            F.round(
                F.sum("d_fp").cast("double") / F.count("*") / F.lit(1e9), 6
            ).alias("avg_distance"),
        )

    head = ranked.filter(F.col("rk") <= _ILD_K).select("vec_id", "embedding")
    tail = (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("rk") > F.col("mx") - _ILD_K)
        .select("vec_id", "embedding")
    )
    return ild(head, "top10").unionByName(ild(tail, "bottom10")).orderBy(
        "list_name"
    )
