"""Document chunking: fixed-window packing with overlap.

Reference semantics (reference memory_engine.py:370-421): split
markdown into <=1500-char chunks with 200-char overlap, dropping
<30-char fragments. Re-expressed as pure array arithmetic — offsets
are a `sequence` over the stride, chunks are `substring` — so a
100 TB re-chunking job is a single scan + explode with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CHUNK = 120
OVERLAP = 20
MIN_CHUNK = 30


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_chunk: int = MAX_CHUNK,
    overlap: int = OVERLAP,
    min_chunk: int = MIN_CHUNK,
) -> DataFrame:
    """Explode each doc into overlapping windows.

    Returns (id, chunk_idx, chunk_start, chunk_text, chunk_len).
    Stride = max_chunk - overlap; last partial window kept iff
    >= min_chunk chars.
    """
    stride = max_chunk - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    exploded = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t"), F.posexplode(starts)
    ).select(
        "id",
        F.col("pos").alias("chunk_idx"),
        F.col("col").alias("chunk_start"),
        F.substring(F.col("_t"), F.col("col"), max_chunk).alias("chunk_text"),
    )
    return exploded.withColumn("chunk_len", F.length("chunk_text")).filter(
        F.col("chunk_len") >= min_chunk
    ).select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        "chunk_text",
        F.col("chunk_len").cast("long").alias("chunk_len"),
    )


def chunk_sql(
    docs_view: str,
    id_col: str,
    text_col: str,
    max_chunk: int = MAX_CHUNK,
    overlap: int = OVERLAP,
    min_chunk: int = MIN_CHUNK,
) -> str:
    stride = max_chunk - overlap
    return f"""
WITH exploded AS (
  SELECT {id_col} AS id,
         CAST(gs.i AS BIGINT) AS chunk_start,
         substr({text_col}, CAST(gs.i AS INT), {max_chunk}) AS chunk_text
  FROM {docs_view},
       LATERAL (SELECT unnest(range(1, greatest(length({text_col}), 1) + 1, {stride})) AS i) gs
),
chunks AS (
  SELECT id, chunk_start, chunk_text, CAST(length(chunk_text) AS BIGINT) AS chunk_len
  FROM exploded
)
SELECT id,
       CAST((chunk_start - 1) // {stride} AS BIGINT) AS chunk_idx,
       chunk_start, chunk_text, chunk_len
FROM chunks
WHERE chunk_len >= {min_chunk}
"""
