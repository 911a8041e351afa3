"""Catalog / small-surface queries: distinct sources, corpus stats,
auth-prefix views, score-threshold search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# A2: distinct sources
# ---------------------------------------------------------------------

_SOURCES_ORACLE = "SELECT DISTINCT source FROM documents ORDER BY source"


@register(
    "distinct_sources",
    oracle=_SOURCES_ORACLE,
    doc="Sorted distinct source listing (reference A2, "
    "memory_engine.py:1318-1320).",
    tags=("agg",),
)
def distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select("source").distinct().orderBy("source")


# ---------------------------------------------------------------------
# A10: stats / stats_light
# ---------------------------------------------------------------------

_STATS_ORACLE = """
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT count(DISTINCT source) FROM documents) AS BIGINT) AS n_sources,
       CAST((SELECT sum(n_chars) FROM documents) AS BIGINT) AS total_chars,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors,
       CAST((SELECT max(len(embedding)) FROM embeddings) AS BIGINT) AS dim
"""


@register(
    "corpus_stats",
    oracle=_STATS_ORACLE,
    doc="Corpus stats rollup (reference A10 stats/stats_light, "
    "memory_engine.py:2766-2790): totals, dimension, index size.",
    tags=("agg",),
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"].agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    e = t["embeddings"].agg(
        F.count("*").alias("n_vectors"),
        F.max(F.size("embedding")).cast("long").alias("dim"),
    )
    return d.crossJoin(e)


# ---------------------------------------------------------------------
# F6: auth prefix view — allowed-prefix ANY semantics
# ---------------------------------------------------------------------

_AUTH_PREFIXES = ["src1", "src3", "src7"]

_AUTH_ORACLE = f"""
SELECT source, CAST(count(*) AS BIGINT) AS n
FROM documents
WHERE {' OR '.join(f"source LIKE '{p}%'" for p in _AUTH_PREFIXES)}
GROUP BY source ORDER BY source
"""


@register(
    "auth_prefix_view",
    oracle=_AUTH_ORACLE,
    doc="Per-session allowed-prefix view: rows visible iff source "
    "startswith ANY granted prefix (reference F6 auth filter, "
    "memory_engine.py:1344-1347, auth_context.py). The OR-of-"
    "startswith predicate pushes to the scan.",
    tags=("filter", "auth"),
)
def auth_prefix_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    pred = None
    for p in _AUTH_PREFIXES:
        clause = F.col("source").startswith(p)
        pred = clause if pred is None else (pred | clause)
    return (
        docs.filter(pred)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# F7: score-threshold search
# ---------------------------------------------------------------------

_THRESH = 0.3


def _threshold_oracle() -> str:
    cos = cosine_sql("e.embedding", "q.embedding", 64)
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, round({cos}, 6) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
)
SELECT vec_id, sim FROM scored
WHERE sim >= {_THRESH}
ORDER BY sim DESC, vec_id ASC
LIMIT 50
"""


@register(
    "threshold_vector_search",
    oracle=_threshold_oracle(),
    doc="Vector search with a score threshold: hits below the cosine "
    "floor are dropped before the top-k (reference F7, "
    "memory_engine.py:1432-1434 — graph-only results are exempt, "
    "handled in graph_merge_reserved).",
    tags=("retrieval", "filter"),
)
def threshold_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim"))
    )
    return (
        scored.filter(F.col("sim") >= _THRESH)
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(50)
    )
