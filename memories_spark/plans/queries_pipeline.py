"""Training-data-pipeline queries: exact hash dedup after a simulated
re-import, auto-linking of new rows to their nearest neighbors, and
the multimodal decode/frame-sample plumbing driven end-to-end.

The exact-dedup and auto-link queries complete the dedup/linking
family (reference C1 deduplicate memory_engine.py:2239-2272 and C8
auto-linking llm_extract.py:730-772); the multimodal queries drive
the REAL stdlib codecs in ``operators/multimodal.py`` (PPM / WAV /
RVID) through Arrow-batched ``mapInPandas`` stages, with oracles
that re-derive every decoded unit from the generation formulas —
the decode path is value-checked, not just shape-checked.
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
# Multimodal: real codecs driven end-to-end (decode -> stats/frames)
# ---------------------------------------------------------------------

#: Media derivation is capped so the synth+decode volume stays test-
#: sized at every SF; at 100 TB the payloads are a real table and the
#: cap disappears with the generator.
_MEDIA_CAP = 500


def _derived_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents with REAL
    payloads (PPM / WAV / RVID, operators/multimodal.py codecs):
    content comes from integer formulas over doc_id, so a SQL oracle
    can re-derive every decoded byte — the decode path is
    value-checked, not just shape-checked. Encoding runs Arrow-
    batched (the data-synthesis boundary)."""
    import pandas as pd

    from memories_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        encode_rvid,
        encode_wav,
    )

    def gen(batches):
        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for did in pdf["doc_id"]:
                i = int(did)
                duration = 1000 + (i % 20) * 377
                if i % 3 == 0:
                    kind = "image"
                    rgb = bytes((i * 13 + p * 7) % 256 for p in range(8 * 6 * 3))
                    payload = encode_ppm(8, 6, rgb)
                    meta = {"width": 8, "height": 6, "sample_rate": None,
                            "duration_ms": None, "format": "ppm"}
                elif i % 3 == 1:
                    kind = "audio"
                    samples = [((i * 37 + j * 11) % 201) - 100 for j in range(duration)]
                    payload = encode_wav(samples, 1000)
                    meta = {"width": None, "height": None, "sample_rate": 1000,
                            "duration_ms": duration, "format": "wav"}
                else:
                    kind = "video"
                    n_frames = min(16, duration // 500)
                    frames = [
                        encode_ppm(
                            4, 4,
                            bytes((i * 101 + f * 97 + p * 7) % 256 for p in range(48)),
                        )
                        for f in range(n_frames)
                    ]
                    payload = encode_rvid(frames, 500)
                    meta = {"width": 4, "height": 4, "sample_rate": None,
                            "duration_ms": duration, "format": "rvid"}
                out["media_id"].append(i)
                out["kind"].append(kind)
                out["payload"].append(payload)
                out["meta"].append(meta)
            yield pd.DataFrame(out)

    return (
        docs.filter(F.col("doc_id") < _MEDIA_CAP)
        .select("doc_id")
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


_GRAY = (
    "( (({base} + (3*qs.q)*7) % 256)"
    " + (({base} + (3*qs.q+1)*7) % 256)"
    " + (({base} + (3*qs.q+2)*7) % 256) ) // 3"
)

_MEDIA_ROLLUP_ORACLE = f"""
WITH img AS (
  SELECT d.doc_id, {_GRAY.format(base="d.doc_id*13")} AS unit
  FROM documents d, LATERAL (SELECT unnest(range(0, 48)) AS q) qs
  WHERE d.doc_id % 3 = 0 AND d.doc_id < {_MEDIA_CAP}
),
aud AS (
  SELECT d.doc_id, ((d.doc_id*37 + js.j*11) % 201) - 100 AS unit
  FROM documents d,
       LATERAL (SELECT unnest(range(0, 1000 + (d.doc_id % 20)*377)) AS j) js
  WHERE d.doc_id % 3 = 1 AND d.doc_id < {_MEDIA_CAP}
),
vid AS (
  SELECT d.doc_id, {_GRAY.format(base="d.doc_id*101 + fs.f*97")} AS unit
  FROM documents d,
       LATERAL (SELECT unnest(range(0, least(16, (1000 + (d.doc_id % 20)*377) // 500))) AS f) fs,
       LATERAL (SELECT unnest(range(0, 16)) AS q) qs
  WHERE d.doc_id % 3 = 2 AND d.doc_id < {_MEDIA_CAP}
),
items AS (
  SELECT 'image' AS kind, doc_id, sum(unit) AS ssum, count(*) AS sn FROM img GROUP BY doc_id
  UNION ALL
  SELECT 'audio', doc_id, sum(unit), count(*) FROM aud GROUP BY doc_id
  UNION ALL
  SELECT 'video', doc_id, sum(unit), count(*) FROM vid GROUP BY doc_id
)
SELECT kind, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(ssum) AS BIGINT) AS signal_sum,
       CAST(sum(sn) AS BIGINT) AS signal_n
FROM items GROUP BY kind ORDER BY kind
"""


@register(
    "media_feature_rollup",
    oracle=_MEDIA_ROLLUP_ORACLE,
    doc="Multimodal decode driven end-to-end with REAL codecs: binary "
    "payloads (PPM images, WAV audio, RVID frame containers) -> "
    "Arrow-batched mapInPandas decode (operators/multimodal.py) -> "
    "all-integer per-item content statistics -> per-kind rollup. The "
    "oracle re-derives every decoded unit (luma values, int16 "
    "samples) from the generation formulas, so the codec path is "
    "VALUE-checked: one mis-parsed byte anywhere moves signal_sum.",
    tags=("multimodal",),
)
def media_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    stats = mm_op.signal_stats(_derived_media(docs))
    return (
        stats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("signal_sum").cast("long").alias("signal_sum"),
            F.sum("signal_n").cast("long").alias("signal_n"),
        )
        .orderBy("kind")
    )


_FRAME_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(least(16, (1000 + (doc_id % 20) * 377) // 500) AS BIGINT) AS n_frames,
       CAST((least(16, (1000 + (doc_id % 20) * 377) // 500) - 1) * 500 AS BIGINT) AS last_frame_ms
FROM documents WHERE doc_id % 3 = 2 AND doc_id < {_MEDIA_CAP}
ORDER BY media_id
"""


@register(
    "video_frame_sample",
    oracle=_FRAME_ORACLE,
    doc="Video frame sampling through the real container codec: the "
    "RVID payload is decoded (operators/multimodal.py sample_frames) "
    "and one row per stored frame is emitted with the frame's actual "
    "PPM bytes; rolled back up per video so the oracle verifies the "
    "explosion count and timestamp arithmetic exactly.",
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

_PHASH_ORACLE = f"""
WITH pix AS (
  SELECT d.doc_id, fs.f, qs.q,
         {_GRAY.format(base="d.doc_id*101 + fs.f*97")} AS gray
  FROM documents d,
       LATERAL (SELECT unnest(range(0, least(16, (1000 + (d.doc_id % 20)*377) // 500))) AS f) fs,
       LATERAL (SELECT unnest(range(0, 16)) AS q) qs
  WHERE d.doc_id % 3 = 2 AND d.doc_id < {_MEDIA_CAP}
),
fr AS (
  SELECT doc_id, f, q, gray,
         sum(gray) OVER (PARTITION BY doc_id, f) AS total
  FROM pix
),
fps AS (
  SELECT doc_id AS media_id, f,
         printf('%04x', CAST(sum(
           CASE WHEN gray*16 > total THEN (CAST(1 AS BIGINT) << (15 - q)) ELSE 0 END
         ) AS BIGINT)) AS fp
  FROM fr GROUP BY doc_id, f
),
buckets AS (
  SELECT fp AS bucket,
         CAST(count(*) AS BIGINT) AS n_frames,
         CAST(count(DISTINCT media_id) AS BIGINT) AS n_videos
  FROM fps GROUP BY fp
)
SELECT bucket, n_frames, n_videos
FROM buckets WHERE n_frames > 1
ORDER BY n_frames DESC, bucket ASC
LIMIT 20
"""


@register(
    "frame_phash_dedup",
    oracle=_PHASH_ORACLE,
    doc="Frame-level near-duplicate detection across videos with a "
    "REAL perceptual hash: every RVID frame is decoded to pixels and "
    "average-hashed (integer luma, bit = pixel above the frame mean "
    "— operators/multimodal.frame_fingerprints), frames bucket by "
    "hash, and buckets holding more than one frame surface as "
    "near-dup candidates with their video spread — the video "
    "analogue of MinHash banding: candidate generation is a pure "
    "groupBy on the hash key, never a frame-to-frame join. The "
    "oracle re-derives luma -> mean -> bit vector -> hex in SQL, so "
    "the decode + hash chain is value-checked end to end.",
    tags=("multimodal", "dedup"),
)
def frame_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    fps = mm_op.frame_fingerprints(
        _derived_media(docs), every_ms=500, max_frames=16
    )
    buckets = fps.groupBy(F.col("fp").alias("bucket")).agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("media_id").alias("n_videos"),
    )
    return (
        buckets.filter(F.col("n_frames") > 1)
        .orderBy(F.col("n_frames").desc(), F.col("bucket").asc())
        .limit(20)
    )
