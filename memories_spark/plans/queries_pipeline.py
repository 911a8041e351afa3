"""Training-data-pipeline queries: exact hash dedup after a simulated
re-import, auto-linking of new rows to their nearest neighbors, and
the multimodal decode/frame-sample plumbing driven end-to-end.

The exact-dedup and auto-link queries complete the dedup/linking
family (reference C1 deduplicate memory_engine.py:2239-2272 and C8
auto-linking llm_extract.py:730-772); the multimodal queries exercise
the Arrow-batched ``mapInPandas`` stages in
``operators/multimodal.py`` with shape oracles (the featurizer itself
is the deterministic stand-in for a codec, honestly non-SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.operators import multimodal as mm_op
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Exact dedup: hash-groupBy over a corpus with a re-imported subset
# ---------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 37 = 0
),
hashed AS (SELECT id, md5(text) AS text_hash FROM corpus)
SELECT text_hash,
       CAST(min(id) AS BIGINT) AS keeper_id,
       CAST(count(*) - 1 AS BIGINT) AS n_victims
FROM hashed
GROUP BY text_hash
HAVING count(*) > 1
ORDER BY keeper_id
"""


@register(
    "exact_dup_groups",
    oracle=_EXACT_DEDUP_ORACLE,
    bench=True,
    doc="Exact dedup via hash-groupBy: md5(text) groups after a "
    "simulated re-import of every 37th doc; keeper = min id, the "
    "rest are victims (reference C1 keep-earliest rule, "
    "memory_engine.py:2239-2272, degenerate sim=1.0 case). At scale "
    "this is one shuffle on a 16-byte key — the cheapest dedup pass "
    "and the first stage of any training-data pipeline.",
    tags=("dedup", "exact"),
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.select(F.col("doc_id").alias("id"), "text")
    reimport = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 1000000).alias("id"), "text"
    )
    corpus = base.unionAll(reimport)
    return (
        corpus.groupBy(F.expr("md5(text)").alias("text_hash"))
        .agg(F.min("id").alias("keeper_id"), (F.count("*") - 1).alias("n_victims"))
        .filter(F.col("n_victims") > 0)
        .orderBy("keeper_id")
    )


# ---------------------------------------------------------------------
# Auto-linking: new rows -> top-3 nearest corpus neighbors (C8)
# ---------------------------------------------------------------------

_EMB_DIM = 64
_LINK_COS = cosine_sql("n.embedding", "c.embedding", _EMB_DIM)

_AUTO_LINK_ORACLE = f"""
WITH new_rows AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0
),
scored AS (
  SELECT n.vec_id AS from_id, c.vec_id AS to_id,
         round({_LINK_COS}, 6) AS sim
  FROM new_rows n JOIN embeddings c ON n.vec_id != c.vec_id
),
ranked AS (
  SELECT from_id, to_id, sim,
         row_number() OVER (PARTITION BY from_id ORDER BY sim DESC, to_id ASC) AS rank
  FROM scored WHERE sim >= 0.1
)
SELECT from_id, to_id, sim, CAST(rank AS BIGINT) AS rank,
       'related_to' AS link_type
FROM ranked WHERE rank <= 3
ORDER BY from_id, rank
"""


@register(
    "auto_link_topk",
    oracle=_AUTO_LINK_ORACLE,
    doc="Auto-linking (reference C8, llm_extract.py:730-772): each "
    "newly added row links to its top-3 similar neighbors above a "
    "similarity floor as typed related_to edges. The new set is tiny "
    "relative to the corpus, so it broadcasts into a single corpus "
    "scan — no shuffle of the big side.",
    tags=("graph", "dedup", "vector"),
)
def auto_link_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    new_rows = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("from_id"), F.col("embedding").alias("new_vec")
    )
    scored = (
        emb.join(F.broadcast(new_rows), F.col("from_id") != F.col("vec_id"))
        .select(
            "from_id",
            F.col("vec_id").alias("to_id"),
            F.round(cosine_expr("new_vec", "embedding"), 6).alias("sim"),
        )
        .filter(F.col("sim") >= 0.1)
    )
    w = Window.partitionBy("from_id").orderBy(F.desc("sim"), F.asc("to_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .withColumn("link_type", F.lit("related_to"))
        .orderBy("from_id", "rank")
    )


# ---------------------------------------------------------------------
# Multimodal: feature extraction + frame sampling, driven end-to-end
# ---------------------------------------------------------------------


def _derived_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: payload =
    md5(text) bytes, kind round-robins image/audio/video, duration
    derived from the id. Both engines can derive the identifiers; the
    payload bytes feed the real Arrow-batched stages."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    duration = (F.lit(1000) + (F.col("doc_id") % 20) * 377).cast("long")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.expr("md5(text)")).alias("payload"),
        F.struct(duration.alias("duration_ms")).alias("meta"),
    )


_MEDIA_ROLLUP_ORACLE = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(count(*) AS BIGINT) AS n,
       CAST(8 AS BIGINT) AS feature_dim
FROM documents
GROUP BY 1 ORDER BY kind
"""


@register(
    "media_feature_rollup",
    oracle=_MEDIA_ROLLUP_ORACLE,
    doc="Multimodal feature extraction driven end-to-end: binary "
    "payload column -> Arrow-batched mapInPandas featurizer "
    "(operators/multimodal.py, codec step stubbed deterministically) "
    "-> per-kind rollup. The oracle checks the shape contract (row "
    "coverage per kind, feature dimensionality actually produced); "
    "the feature values themselves are the non-SQL codec boundary.",
    tags=("multimodal",),
)
def media_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    feats = mm_op.extract_features(_derived_media(docs), dim=8)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.max(F.size("feature")).cast("long").alias("feature_dim"),
        )
        .orderBy("kind")
    )


_FRAME_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(least(16, (1000 + (doc_id % 20) * 377) // 500) AS BIGINT) AS n_frames,
       CAST((least(16, (1000 + (doc_id % 20) * 377) // 500) - 1) * 500 AS BIGINT) AS last_frame_ms
FROM documents WHERE doc_id % 3 = 2
ORDER BY media_id
"""


@register(
    "video_frame_sample",
    oracle=_FRAME_ORACLE,
    doc="Video frame sampling: one row per sampled timestamp every "
    "500 ms (max 16), emitted by the Arrow-batched row-exploding "
    "mapInPandas stage (operators/multimodal.py sample_frames); "
    "rolled back up per video so the oracle verifies the explosion "
    "count and timestamp arithmetic exactly.",
    tags=("multimodal",),
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    frames = mm_op.sample_frames(_derived_media(docs), every_ms=500, max_frames=16)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max("frame_ms").cast("long").alias("last_frame_ms"),
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------
# Frame-level near-dup detection (phash-bucket dedup across videos)
# ---------------------------------------------------------------------

_PHASH_ORACLE = """
WITH vids AS (
  SELECT doc_id AS media_id, md5(text) AS ptxt,
         1000 + (doc_id % 20) * 377 AS duration
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT media_id,
         md5(ptxt || '-' || CAST(i AS VARCHAR)) AS fp
  FROM vids, (SELECT unnest(generate_series(0, 15)) AS i)
  WHERE i < least(16, duration // 500)
),
buckets AS (
  SELECT substr(fp, 1, 2) AS bucket,
         CAST(count(*) AS BIGINT) AS n_frames,
         CAST(count(DISTINCT media_id) AS BIGINT) AS n_videos
  FROM frames GROUP BY substr(fp, 1, 2)
)
SELECT bucket, n_frames, n_videos
FROM buckets WHERE n_frames > 1
ORDER BY n_frames DESC, bucket ASC
LIMIT 20
"""


@register(
    "frame_phash_dedup",
    oracle=_PHASH_ORACLE,
    doc="Frame-level near-duplicate detection across videos: every "
    "sampled frame gets a perceptual-hash stub from the "
    "Arrow-batched fingerprint stage "
    "(operators/multimodal.frame_fingerprints — the decode->phash "
    "boundary, stubbed deterministically per the multimodal "
    "contract), frames bucket by hash prefix, and buckets holding "
    "more than one frame surface as near-dup candidates with "
    "their video spread — the video analogue of MinHash banding: "
    "candidate generation is a pure groupBy on the bucket key, "
    "never a frame-to-frame join. The oracle re-derives the "
    "fingerprint chain in SQL, so the mapInPandas explosion, "
    "hashing and rollup are all value-checked, not just counted.",
    tags=("multimodal", "dedup"),
)
def frame_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    fps = mm_op.frame_fingerprints(
        _derived_media(docs), every_ms=500, max_frames=16
    )
    buckets = fps.groupBy(F.substring("fp", 1, 2).alias("bucket")).agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("media_id").alias("n_videos"),
    )
    return (
        buckets.filter(F.col("n_frames") > 1)
        .orderBy(F.col("n_frames").desc(), F.col("bucket").asc())
        .limit(20)
    )
