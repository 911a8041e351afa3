"""Advanced analytics batch 19: MMR diversity re-ranking of a vector
shortlist — the serving-path final stage that trades pure relevance
for coverage.

All comparisons run on fixed-point BIGINT scores (rel and pairwise
sims frozen at 1e9, MMR score = 7*rel_fp - 3*maxsim_fp, i.e.
lambda=0.7 scaled by 10), so the greedy selection is bit-identical in
Spark, Python, and the chained-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.functions.topk import ranked_topk
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_SHORT = 8   # relevance shortlist size
_K = 5       # final diverse set size
_DIM = 64


def _mmr_oracle() -> str:
    cos_q = cosine_sql("e.embedding", "q.embedding", _DIM)
    cos_p = cosine_sql("x.embedding", "y.embedding", _DIM)
    steps = []
    for k in range(2, _K + 1):
        steps.append(f"""
step{k} AS (
  SELECT c.vec_id, c.rel_fp,
         7 * c.rel_fp - 3 * max(s.sim_fp) AS score_fp
  FROM cand c
  JOIN sims s ON s.a = c.vec_id AND s.b IN (SELECT vec_id FROM sel{k - 1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
  GROUP BY c.vec_id, c.rel_fp
  ORDER BY score_fp DESC, c.vec_id ASC LIMIT 1
),
sel{k} AS (
  SELECT vec_id, rel_fp, rank FROM sel{k - 1}
  UNION ALL
  SELECT vec_id, rel_fp, {k} AS rank FROM step{k}
)""")
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         CAST(round({cos_q} * 1e9) AS BIGINT) AS rel_fp
  FROM embeddings e, q WHERE e.vec_id != 0
),
cand AS (
  SELECT vec_id, rel_fp FROM scored
  ORDER BY rel_fp DESC, vec_id ASC LIMIT {_SHORT}
),
sims AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         CAST(round({cos_p} * 1e9) AS BIGINT) AS sim_fp
  FROM embeddings x
  JOIN embeddings y ON x.vec_id != y.vec_id
  WHERE x.vec_id IN (SELECT vec_id FROM cand)
    AND y.vec_id IN (SELECT vec_id FROM cand)
),
sel1 AS (
  SELECT vec_id, rel_fp, 1 AS rank FROM cand
  ORDER BY rel_fp DESC, vec_id ASC LIMIT 1
),{",".join(steps)}
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       round(CAST(rel_fp AS DOUBLE) / 1e9, 6) AS relevance
FROM sel{_K}
ORDER BY rank
"""


@register(
    "mmr_diverse_rerank",
    oracle=_mmr_oracle(),
    doc="Maximal-marginal-relevance re-rank: the top-8 cosine "
    "shortlist for the query vector is greedily re-selected down "
    "to 5 results maximizing 0.7*relevance - 0.3*max-similarity- "
    "to-already-selected — the diversity stage a serving stack "
    "runs after ANN retrieval so near-duplicate hits don't crowd "
    "the page (complements novelty_check, which gates a single "
    "candidate). Spark does the distributed part — corpus scoring, "
    "the top-8 shortlist, the 8x8 sim matrix — and the K-step "
    "greedy argmax runs on the DRIVER over those <=72 integers, "
    "the deliberate serving-layer split: O(shortlist^2) work "
    "INDEPENDENT of corpus size does not deserve K chained "
    "Catalyst plans (measured ~100s of pure planner time for 8 "
    "rows). Scores are fixed-point BIGINTs (7*rel - 3*maxsim), "
    "ties by vec_id, so the selection path is engine-exact; the "
    "oracle replays it as chained CTEs.",
    tags=("retrieval", "similarity"),
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(cosine_expr("embedding", "qv") * F.lit(1e9))
            .cast("long")
            .alias("rel_fp"),
        )
    )
    cand = ranked_topk(
        scored, [F.desc("rel_fp"), F.asc("vec_id")], _SHORT, rank_col="rn"
    ).select("vec_id", "embedding", "rel_fp")
    x = cand.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    y = cand.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sims = (
        x.join(y, F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine_expr("ea", "eb") * F.lit(1e9))
            .cast("long")
            .alias("sim_fp"),
        )
    )
    # The distributed work ends here: corpus scoring, the top-8
    # shortlist, and its 8x8 sim matrix. The greedy selection runs on
    # the DRIVER over those <=72 numbers — this is the serving-layer
    # re-rank stage, and expressing K chained argmax steps as Spark
    # plans would only build a deep lazy plan whose optimization cost
    # dwarfs the 8-row compute (measured ~100s of pure Catalyst time
    # vs milliseconds here). Determinism is unchanged: the collected
    # sets are exact fixed-point integers with total ordering.
    pool = {
        r["vec_id"]: r["rel_fp"]
        for r in cand.select("vec_id", "rel_fp").collect()
    }
    sim = {(r["a"], r["b"]): r["sim_fp"] for r in sims.collect()}
    selected: list[tuple[int, int, int]] = []  # (rank, vec_id, rel_fp)
    first = min(pool, key=lambda v: (-pool[v], v))
    selected.append((1, first, pool[first]))
    chosen = {first}
    for k in range(2, _K + 1):
        best = None
        for v in sorted(vv for vv in pool if vv not in chosen):
            maxsim = max(sim[(v, s)] for s in chosen)
            score = 7 * pool[v] - 3 * maxsim
            if best is None or score > best[0] or (score == best[0] and v < best[1]):
                best = (score, v)
        selected.append((k, best[1], pool[best[1]]))
        chosen.add(best[1])
    out = spark.createDataFrame(
        [(rank, vid, rel) for rank, vid, rel in selected],
        "rank long, vec_id long, rel_fp long",
    )
    return out.select(
        "rank",
        "vec_id",
        F.round(F.col("rel_fp").cast("double") / F.lit(1e9), 6).alias(
            "relevance"
        ),
    ).orderBy("rank")
