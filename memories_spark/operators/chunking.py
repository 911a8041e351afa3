"""Document chunking: fixed-window packing with overlap, plus
header-aware markdown packing.

Reference semantics (reference memory_engine.py:370-421): split
markdown by ``#``–``####`` headers, pack paragraphs to <=1500-char
chunks with 200-char overlap, drop <30-char fragments, emit
``(chunk_text, "{source}:chunk_{i}")``. Two implementations:

- :func:`chunk_documents` — fixed-window re-expressed as pure array
  arithmetic (sequence + substring explode): a 100 TB re-chunking
  job is one scan with zero Python.
- :func:`chunk_markdown` / :func:`chunk_markdown_df` — the
  header/paragraph-aware variant; inherently sequential per document
  so it runs as an Arrow-batched ``mapInPandas`` (per-document
  parallelism, no per-row Python pickling).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------
# Header-aware markdown chunking (reference S1 chunk_markdown,
# memory_engine.py:370-421)
# ---------------------------------------------------------------------

MD_MAX_CHUNK = 1500
MD_OVERLAP = 200
MD_MIN_CHUNK = 30

_HEADER_RE = re.compile(r"^(#{1,4})\s", re.MULTILINE)


def chunk_markdown(
    content: str,
    source_name: str,
    max_chunk_size: int = MD_MAX_CHUNK,
    overlap_size: int = MD_OVERLAP,
    min_chunk: int = MD_MIN_CHUNK,
) -> list[tuple[str, str]]:
    """Split markdown by headers, pack paragraphs with overlap.

    Sections start at every ``#``..``####`` heading; paragraphs
    (blank-line separated) pack greedily into <=max_chunk_size
    chunks; each continuation chunk is seeded with the tail
    ``overlap_size`` chars of its predecessor; fragments shorter
    than ``min_chunk`` are dropped. Returns
    ``[(chunk_text, f"{source_name}:chunk_{i}"), ...]`` with a
    global chunk counter, like the reference.
    """
    sections: list[str] = []
    last = 0
    for m in _HEADER_RE.finditer(content):
        if m.start() > last:
            sections.append(content[last:m.start()])
        last = m.start()
    sections.append(content[last:])

    chunks: list[str] = []
    for section in sections:
        paragraphs = [p.strip() for p in re.split(r"\n\s*\n", section) if p.strip()]
        cur = ""
        for para in paragraphs:
            candidate = f"{cur}\n\n{para}" if cur else para
            if len(candidate) <= max_chunk_size:
                cur = candidate
                continue
            if cur:
                chunks.append(cur)
                tail = cur[-overlap_size:] if overlap_size else ""
                cur = f"{tail}\n\n{para}" if tail else para
            else:
                cur = para
            # a single paragraph longer than the limit hard-wraps
            while len(cur) > max_chunk_size:
                chunks.append(cur[:max_chunk_size])
                cur = cur[max_chunk_size - overlap_size:]
        if cur:
            chunks.append(cur)

    out = []
    for text in chunks:
        if len(text) >= min_chunk:
            out.append((text, f"{source_name}:chunk_{len(out)}"))
    return out


MD_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_source", T.StringType()),
        T.StructField("chunk_text", T.StringType()),
    ]
)


def chunk_markdown_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    **kwargs,
) -> DataFrame:
    """Distributed markdown chunking: one output row per chunk."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, texts = [], [], []
            for doc_id, text, source in zip(pdf[id_col], pdf[text_col], pdf[source_col]):
                for chunk_text, chunk_source in chunk_markdown(
                    text or "", source or "", **kwargs
                ):
                    ids.append(doc_id)
                    srcs.append(chunk_source)
                    texts.append(chunk_text)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_source": srcs,
                    "chunk_text": texts,
                }
            )

    return docs.select(id_col, text_col, source_col).mapInPandas(run, MD_CHUNK_SCHEMA)
