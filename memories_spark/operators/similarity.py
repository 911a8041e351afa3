"""Vector similarity: brute-force top-k, kNN joins, LSH bucketing.

Reference semantics: query embedding vs corpus, cosine on normalized
vectors, top-k with score threshold (reference
memory_engine.py:1383-1440, qdrant_store.py:188-215); all-pairs
similarity for dedup (memory_engine.py:2199-2237).

Scale design:
- Brute-force cosine is a broadcast of the (tiny) query set against a
  partitioned corpus scan — embarrassingly parallel, no shuffle, and
  the per-row math is a codegen'd higher-order-function fold. This is
  the exact-answer baseline and is the right plan up to ~10^7 rows
  per query batch.
- For all-pairs at 100 TB, quadratic blow-up is avoided by blocking:
  sign-projection LSH buckets (random-hyperplane sketches on the unit
  sphere ≈ cosine locality) so candidate pairs only form within a
  bucket, then exact re-scoring. Hyperplanes are deterministic
  pseudo-vectors so results are reproducible anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.operators.partitioning import spread_for_compute


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    threshold: float | None = None,
    exclude_self: bool = True,
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) × corpus scan → codegen'd cosine →
    per-query window top-k (ties broken by id ASC for determinism,
    reference-style — SURVEY §4 'tie-break parity').
    """
    # Spread a narrow corpus scan before the |Q| x dim cosine folds
    # (see partitioning.py) — no-op on wide inputs.
    joined = spread_for_compute(corpus).crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = F.round(cosine_expr(vec_col, query_vec_col), round_dp)
    scored = joined.select(query_id_col, id_col, sim.alias("sim"))
    if threshold is not None:
        scored = scored.filter(F.col("sim") >= threshold)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def topk_cosine_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    threshold: float | None = None,
    exclude_self: bool = True,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors for a LARGE query set — no broadcast.

    :func:`topk_cosine`'s ``broadcast(queries)`` is the right plan
    only while the query set fits the driver and every executor (a
    few 10^4 vectors); beyond that the broadcast is a driver-OOM and
    the cross join is quadratic work anyway. Here both sides are
    bucketed by deterministic sign-projection LSH
    (:func:`lsh_bucket_expr`) and the join is a shuffled EQUI-join on
    the bucket key, with Hamming-radius-1 multiprobe on the query
    side (:func:`multiprobe_buckets_expr`) so near neighbors that
    straddle one hyperplane are still found. Candidate volume is
    ~|Q|x|C|x(n_planes+1)/2^n_planes instead of |Q|x|C|, and nothing
    is collected to the driver.

    APPROXIMATE by construction — a neighbor more than one hyperplane
    away from the query's bucket is missed. That is the same contract
    as the reference's novelty check, which runs on Qdrant's HNSW
    (approximate) index (reference qdrant_store.py:188-215); vectors
    at near-dup similarity are overwhelmingly co-bucketed.
    """
    cb = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_expr(vec_col, dim, n_planes).alias("_b"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.explode(
            multiprobe_buckets_expr(
                lsh_bucket_expr(query_vec_col, dim, n_planes), n_planes
            )
        ).alias("_b"),
    )
    joined = qb.join(cb, "_b")
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = F.round(cosine_expr(vec_col, query_vec_col), round_dp)
    scored = joined.select(query_id_col, id_col, sim.alias("sim")).dropDuplicates(
        [query_id_col, id_col]  # a pair can co-occur in several probes
    )
    if threshold is not None:
        scored = scored.filter(F.col("sim") >= threshold)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def knn_sql(
    emb_view: str,
    dim: int,
    k: int,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> str:
    """DuckDB oracle for :func:`topk_cosine` where the query set is
    'the embeddings of these ids'."""
    ids = ", ".join(str(i) for i in query_ids)
    cos = cosine_sql(f"c.{vec_col}", f"q.{vec_col}", dim)
    return f"""
WITH q AS (SELECT {id_col} AS query_id, {vec_col} FROM {emb_view} WHERE {id_col} IN ({ids})),
scored AS (
  SELECT q.query_id, c.{id_col} AS {id_col}, round({cos}, {round_dp}) AS sim
  FROM {emb_view} c CROSS JOIN q
  WHERE c.{id_col} != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, {id_col} ASC) AS rank
  FROM scored
)
SELECT query_id, {id_col}, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


# --- deterministic sign-projection LSH -------------------------------

def _basis_component(dim_idx: Column, plane: int) -> Column:
    """Pseudo-random hyperplane component in [-3, 3]: a fixed integer
    recurrence so Spark and the oracle agree without shipping data."""
    v = (dim_idx * F.lit(31) + F.lit(plane * 17 + 7)) % F.lit(7)
    return (v - F.lit(3)).cast("double")


def lsh_bucket_expr(vec_col: str | Column, dim: int, n_planes: int) -> Column:
    """Bit-string bucket id: sign of the projection on each plane."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def _projector(p: int):
        return lambda i: F.element_at(vec, i).cast("double") * _basis_component(i, p)

    bits = []
    for p in range(n_planes):
        idx = F.sequence(F.lit(1), F.lit(dim))
        prods = F.transform(idx, _projector(p))
        proj = F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket_sql(vec_col: str, dim: int, n_planes: int) -> str:
    """DuckDB mirror of :func:`lsh_bucket_expr` (same fold order)."""
    bit_exprs = []
    for p in range(n_planes):
        terms = " + ".join(
            f"CAST({vec_col}[{i}] AS DOUBLE)*{float((i * 31 + p * 17 + 7) % 7 - 3)!r}"
            for i in range(1, dim + 1)
        )
        bit_exprs.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return "(" + " || ".join(bit_exprs) + ")"


def multiprobe_buckets_expr(bucket_col: str | Column, n_planes: int) -> Column:
    """Hamming-radius-1 probe set of a sign-LSH bucket bit-string:
    the bucket itself plus each single-bit flip (n_planes+1 probes).

    Multi-probe LSH trades a bounded candidate growth
    ((n+1)/2^n of the corpus in expectation) for a large recall gain —
    near neighbors that straddle one hyperplane land in a probed
    bucket. Exploding the probe set keeps the corpus join an exact
    EQUI-join on the bucket key: no inequality predicate, no
    nested-loop join, at any corpus size.
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    probes = [b]
    for i in range(1, n_planes + 1):
        flipped = F.when(F.substring(b, i, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
        probes.append(
            F.concat(F.substring(b, 1, i - 1), flipped, F.substring(b, i + 1, n_planes - i))
        )
    return F.array(*probes)


def multiprobe_buckets_sql(bucket_expr: str, n_planes: int) -> str:
    """DuckDB mirror of :func:`multiprobe_buckets_expr`."""
    probes = [bucket_expr]
    for i in range(1, n_planes + 1):
        flipped = f"CASE WHEN {bucket_expr}[{i}] = '1' THEN '0' ELSE '1' END"
        probes.append(
            f"({bucket_expr}[1:{i - 1}] || {flipped} || {bucket_expr}[{i + 1}:{n_planes}])"
        )
    return "list_value(" + ", ".join(probes) + ")"


def cosine_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | Column | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """All-pairs cosine >= threshold, blocked to avoid O(N^2).

    ``block_col`` (e.g. an LSH bucket from :func:`lsh_bucket_expr`)
    confines the self-join to co-bucketed rows; pairs are canonical
    ``id_a < id_b`` (reference pair-dedup, memory_engine.py:2223-2226).
    """
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if block_col is not None:
        blocked = corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            (F.col(block_col) if isinstance(block_col, str) else block_col).alias("b"),
        )
        a = blocked.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "b")
        bdf = blocked.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "b")
        pairs = a.join(bdf, "b").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        bdf = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(bdf).filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine_expr("va", "vb"), round_dp)
    return pairs.select("id_a", "id_b", sim.alias("sim")).filter(F.col("sim") >= threshold)
