"""Trained-centroid IVF approximate nearest neighbors (nprobe=3).

Completes the ANN family (brute force -> hash-bucketed IVF ->
multi-probe LSH) with the real IVF structure: data-dependent
centroids, a partition-assignment build pass, and multi-cell probing
at query time — the FAISS-style layout that scales vector search
past the point where hashing alone keeps recall.

The expensive, query-independent stages (k-means training, cell
assignment, PQ encoding) run as PERSISTED index builds cached per
corpus fingerprint; queries probe by partition pruning (see the
"Persisted ANN index builds" section below). The engine-level
serving twin over a mutable store — with table-version staleness and
incremental refresh — lives in ``operators/ann_index.py``.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import fixed_point, fixed_point_sql
from memories_spark.functions.topk import ranked_topk
from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables, read_parquet_memoized

# ---------------------------------------------------------------------
# Persisted ANN index builds
#
# Training/assignment/encoding are QUERY-INDEPENDENT: at 100 TB they
# are one-off index builds (FAISS train + add), persisted partitioned
# by cell so probes become partition pruning. Each build is keyed by
# the corpus fingerprint (path + size + mtime) and written once; the
# probe-time queries read it. Round-2 review flagged the in-query
# retraining as the repo's one perf regression — this is the hoist.
# ---------------------------------------------------------------------

_INDEX_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".index_cache",
)


#: Bump on ANY change to the index build logic/layout: the cache key
#: folds it in, so stale on-disk indexes from older code re-build
#: instead of silently serving (r3 advice: a constants change would
#: otherwise surface as baffling oracle-parity failures).
INDEX_FORMAT_VERSION = 1


def _corpus_key(sf_dir: str, table: str = "embeddings.parquet") -> str:
    p = os.path.join(sf_dir, table)
    try:
        st = os.stat(p)
        raw = f"{os.path.abspath(p)}:{st.st_size}:{int(st.st_mtime)}"
    except OSError:
        raw = os.path.abspath(p)
    # algorithm/params identity: same corpus + different build
    # constants must MISS the cache
    raw += f"|v{INDEX_FORMAT_VERSION}|dim{_DIM}|np{_NPROBE}|c{_CENT_LIST}"
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def _ensure_index(
    name: str, sf_dir: str, build, table: str = "embeddings.parquet"
) -> str:
    """Build-once/read-many: ``build(tmp_dir)`` writes the index under
    a tmp path which is atomically renamed into the cache (safe under
    the threaded test harness — a concurrent loser just removes its
    tmp). ``table`` is the source file the corpus fingerprint stats
    (the BM25 index keys on documents, the vector indexes on
    embeddings)."""
    dest = os.path.join(_INDEX_CACHE, f"{name}-{_corpus_key(sf_dir, table)}")
    if os.path.isdir(dest):
        return dest
    os.makedirs(_INDEX_CACHE, exist_ok=True)
    tmp = f"{dest}.tmp-{uuid.uuid4().hex[:8]}"
    build(tmp)
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race; reuse winner
    return dest

_DIM = 64
# k-means INIT: a fixed deterministic spread of corpus vector ids
# (valid at every SF) seeds the training pass; the centroids actually
# used by the index are the Lloyd-refined per-cell means — data-
# dependent, not the frozen seed vectors. (PQ below still uses the
# seed vectors as its codebook; its contract is separate.)
_CENTROID_IDS = [7 + 30 * i for i in range(16)]
_NPROBE = 3

_CENT_LIST = ", ".join(str(i) for i in _CENTROID_IDS)

_IVF_TRAINED_ORACLE = f"""
WITH dims AS (SELECT unnest(range(1, {_DIM + 1})) AS d),
pts AS (
  SELECT e.vec_id, dims.d, CAST(e.embedding[dims.d] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN dims
),
seeds AS (
  SELECT vec_id AS cid, d, x AS c FROM pts WHERE vec_id IN ({_CENT_LIST})
),
d1 AS (
  SELECT p.vec_id, s.cid,
         sum(CAST(round((p.x - s.c)*(p.x - s.c)*1e9) AS BIGINT)) AS dist_fp
  FROM pts p JOIN seeds s ON p.d = s.d GROUP BY p.vec_id, s.cid
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp ASC, cid ASC) AS rk
    FROM d1
  ) WHERE rk = 1
),
cent AS (
  SELECT a1.cid, p.d,
         CAST(sum({fixed_point_sql('p.x', 7)}) AS DOUBLE)/count(*)/10000000.0 AS c
  FROM a1 JOIN pts p ON a1.vec_id = p.vec_id GROUP BY a1.cid, p.d
),
d2 AS (
  SELECT p.vec_id, c.cid,
         sum(CAST(round((p.x - c.c)*(p.x - c.c)*1e9) AS BIGINT)) AS dist_fp
  FROM pts p JOIN cent c ON p.d = c.d GROUP BY p.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp ASC, cid ASC) AS rk
    FROM d2
  ) WHERE rk = 1
),
qprobe AS (
  SELECT cid AS probe_cell FROM (
    SELECT cid, row_number() OVER (ORDER BY dist_fp ASC, cid ASC) AS rk
    FROM d2 WHERE vec_id = 0
  ) WHERE rk <= {_NPROBE}
),
scored AS (
  SELECT e.vec_id, round({cosine_sql('e.embedding', 'q.qv', _DIM)}, 6) AS sim
  FROM assign a
  JOIN qprobe p ON a.cell = p.probe_cell
  JOIN embeddings e ON e.vec_id = a.vec_id
  CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id != 0
)
SELECT vec_id, sim,
       CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
FROM scored
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""


def _pts(emb: DataFrame) -> DataFrame:
    """Explode vectors to (vec_id, d, x) dim-rows."""
    return emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(_DIM))).alias("d"),
        "embedding",
    ).select(
        "vec_id", "d", F.element_at("embedding", F.col("d")).cast("double").alias("x")
    )


def _dists_to(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Fixed-point squared-L2 of every (vec_id) against every centroid
    (cid) — integer-summed so the argmin is order-independent and
    replayable in the DuckDB oracle. The (k x dim) centroid table
    broadcasts; the only shuffle is the per-vector partial sum."""
    return (
        pts.join(F.broadcast(cents), pts.d == cents.sd)
        .select(
            "vec_id",
            "cid",
            F.round(
                (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")) * F.lit(1e9)
            )
            .cast("long")
            .alias("t_fp"),
        )
        .groupBy("vec_id", "cid")
        .agg(F.sum("t_fp").alias("dist_fp"))
    )


def trained_centroids(emb: DataFrame) -> DataFrame:
    """IVF training: seed-init (fixed corpus ids) + ONE Lloyd
    refinement -> the k x dim trained centroid table (cid, sd, c)
    (same fixed-point technique as ``kmeans_refine_step``)."""
    pts = _pts(emb)
    seeds = pts.filter(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("d").alias("sd"), F.col("x").alias("c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist_fp"), F.asc("cid"))
    a1 = (
        _dists_to(pts, seeds)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    return (
        a1.join(pts, "vec_id")
        .groupBy("cid", "d")
        .agg(F.sum(fixed_point(F.col("x"), 7)).alias("s"), F.count("*").alias("cnt"))
        .select(
            "cid",
            F.col("d").alias("sd"),
            (F.col("s").cast("double") / F.col("cnt") / F.lit(10000000.0)).alias("c"),
        )
    )


def trained_cell_dists(emb: DataFrame) -> DataFrame:
    """Every vector's fixed-point distance to every TRAINED cell
    ``(vec_id, cid, dist_fp)`` — the training+assignment pass the
    persisted index build runs once."""
    return _dists_to(_pts(emb), trained_centroids(emb))


def ensure_ivf_trained_index(spark: SparkSession, sf_dir: str) -> str:
    """One-off IVF index build (FAISS train+add equivalent): trained
    centroids plus every vector's cell assignment, persisted
    PARTITIONED BY cell so a probe reads only its cells' files.
    Subsequent queries skip training entirely."""

    def build(tmp: str) -> None:
        emb = load_tables(spark, sf_dir)["embeddings"]
        cent = trained_centroids(emb)
        cent.coalesce(1).write.parquet(os.path.join(tmp, "centroids"))
        read_cent = spark.read.parquet(os.path.join(tmp, "centroids"))
        aw = Window.partitionBy("vec_id").orderBy(F.asc("dist_fp"), F.asc("cid"))
        assign = (
            _dists_to(_pts(emb), read_cent)
            .withColumn("rk", F.row_number().over(aw))
            .filter(F.col("rk") == 1)
            .select("vec_id", F.col("cid").alias("cell"))
        )
        assign.write.partitionBy("cell").parquet(os.path.join(tmp, "assign"))

    return _ensure_index("ivf_trained", sf_dir, build)


@register(
    "ann_ivf_trained",
    oracle=_IVF_TRAINED_ORACLE,
    bench=True,
    doc="IVF with TRAINED centroids and nprobe=3, served from a "
    "PERSISTED index: the one-off build (seeded k-means init + one "
    "Lloyd refinement -> per-cell mean centroids; every vector "
    "assigned by broadcast integer fixed-point argmin) is written "
    "partitioned BY cell; the query computes only the QUERY "
    "vector's 16 centroid distances, collects its 3 probe cells "
    "(3 scalars), and scans just those cells' files — probing IS "
    "partition pruning, the FAISS IVF serving layout. Training "
    "never runs at query time (the round-2 perf regression, "
    "hoisted). Candidates ~= nprobe/K of the corpus; recall "
    "measured against brute force in tests/test_ann_recall.py "
    "(reference R1/J2 at scale, SURVEY §4 'custom work' item 1).",
    tags=("vector", "ann"),
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    idx = ensure_ivf_trained_index(spark, sf_dir)
    cent = read_parquet_memoized(spark, os.path.join(idx, "centroids"))
    assign = read_parquet_memoized(spark, os.path.join(idx, "assign"))

    # query-side: distances of ONE vector to 16 trained centroids
    qd = _dists_to(_pts(emb.filter(F.col("vec_id") == 0)), cent)
    probe_cells = [
        r.cid
        for r in qd.orderBy(F.asc("dist_fp"), F.asc("cid")).limit(_NPROBE).collect()
    ]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    scored = (
        assign.filter(F.col("cell").isin(probe_cells))  # partition pruning
        .filter(F.col("vec_id") != 0)
        .join(emb, "vec_id")  # re-attach vectors for candidates only
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim"))
    )
    return ranked_topk(
        scored, [F.desc("sim"), F.asc("vec_id")], 10
    ).orderBy(F.desc("sim"), F.asc("vec_id"))


# ---------------------------------------------------------------------
# Product quantization with asymmetric distance computation (ADC)
# ---------------------------------------------------------------------

_M = 8          # subspaces
_SUB = _DIM // _M  # dims per subspace
_PQ_SCALE = 9   # fixed-point scale for the ADC partial sums


def _dot_range_sql(a: str, b: str, lo: int, n: int) -> str:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE)*CAST({b}[{i}] AS DOUBLE)"
        for i in range(lo, lo + n)
    )
    return f"({terms})"


def _pq_oracle() -> str:
    assign_branches = "\n  UNION ALL\n".join(
        f"""  SELECT e.vec_id, {m} AS m, c.cid,
         round({_dot_range_sql('e.embedding', 'c.cv', m * _SUB + 1, _SUB)}, 9) AS s
  FROM embeddings e CROSS JOIN cb c"""
        for m in range(_M)
    )
    lut_branches = "\n  UNION ALL\n".join(
        f"""  SELECT {m} AS m, c.cid,
         CAST(round({_dot_range_sql('q.embedding', 'c.cv', m * _SUB + 1, _SUB)} * 1e{_PQ_SCALE}) AS BIGINT) AS v_fp
  FROM q CROSS JOIN cb c"""
        for m in range(_M)
    )
    cos = cosine_sql("e.embedding", "q.embedding", _DIM)
    return f"""
WITH cb AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id IN ({_CENT_LIST})
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
assign_scores AS MATERIALIZED (
{assign_branches}
),
codes AS MATERIALIZED (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY s DESC, cid ASC) AS rn
    FROM assign_scores
  ) WHERE rn = 1
),
lut AS MATERIALIZED (
{lut_branches}
),
adc AS (
  SELECT c.vec_id, CAST(sum(l.v_fp) AS BIGINT) AS adc_fp
  FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.cid
  WHERE c.vec_id != 0
  GROUP BY c.vec_id
),
top AS (
  SELECT vec_id, adc_fp,
         CAST(row_number() OVER (ORDER BY adc_fp DESC, vec_id ASC) AS BIGINT) AS rank
  FROM adc QUALIFY rank <= 10
)
SELECT t.vec_id,
       round(CAST(t.adc_fp AS DOUBLE) / 1e{_PQ_SCALE}, 6) AS adc_score,
       round({cos}, 6) AS true_sim,
       t.rank
FROM top t JOIN embeddings e ON e.vec_id = t.vec_id CROSS JOIN q
ORDER BY t.rank
"""


@register(
    "ann_pq_adc",
    oracle=_pq_oracle(),
    bench=True,
    doc="Product quantization with asymmetric distance computation: "
    "vectors split into 8 subspaces of 8 dims, each encoded as its "
    "nearest of 16 codewords (codebook = subvector slices of the "
    "same deterministic centroid spread as ann_ivf_trained — a "
    "per-subspace k-means stands in its place in production), so a "
    "64-dim float vector compresses to 8 codes (~4 bytes vs 256). "
    "Query time: a 128-entry lookup table of query-slice x codeword "
    "dots, and every candidate scores as EIGHT table lookups summed "
    "in fixed-point — no float vector math per candidate, which is "
    "the whole point at 100 TB (the scan reads codes, not vectors). "
    "Top-10 by ADC estimate, reported against the true cosine so "
    "quantization error is visible. Spark plan: codes come from the "
    "PERSISTED IVF-PQ index build (the encode pass runs once, not "
    "per query); the LUT is a 128-row broadcast; the ADC sum is an "
    "exact BIGINT aggregate over 8-byte code rows — the scan never "
    "touches float vectors until the final 10-row report join.",
    tags=("vector", "ann", "pq"),
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.functions.vectors import dot_expr

    emb = load_tables(spark, sf_dir)["embeddings"]
    idx = ensure_ivfpq_index(spark, sf_dir)
    codes = read_parquet_memoized(spark, os.path.join(idx, "codes"))
    cents = emb.filter(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    ms = F.explode(F.array(*[F.lit(m) for m in range(_M)])).alias("m")
    # codebook: (m, cid, cw = cv[m*8+1 : +8]) — 128 rows
    cb = cents.select(ms, "cid", "cv").select(
        "m", "cid", F.expr(f"slice(cv, m * {_SUB} + 1, {_SUB})").alias("cw")
    )

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    qsub = F.expr(f"slice(qv, m * {_SUB} + 1, {_SUB})")
    lut = q.crossJoin(F.broadcast(cb)).select(
        "m",
        "cid",
        F.round(dot_expr(qsub, F.col("cw")) * F.lit(float(10**_PQ_SCALE)))
        .cast("long")
        .alias("v_fp"),
    )

    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("v_fp").cast("long").alias("adc_fp"))
    )
    top = ranked_topk(adc, [F.desc("adc_fp"), F.asc("vec_id")], 10)
    return (
        top.join(emb.select("vec_id", "embedding"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(F.col("adc_fp").cast("double") / F.lit(float(10**_PQ_SCALE)), 6).alias(
                "adc_score"
            ),
            F.round(cosine_expr("embedding", "qv"), 6).alias("true_sim"),
            "rank",
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------
# IVF-PQ with exact re-rank: the full production ANN pipeline
# ---------------------------------------------------------------------

_SHORTLIST = 30


def _ivfpq_oracle() -> str:
    assign_branches = "\n  UNION ALL\n".join(
        f"""  SELECT e.vec_id, {m} AS m, c.cid,
         round({_dot_range_sql('e.embedding', 'c.cv', m * _SUB + 1, _SUB)}, 9) AS s
  FROM cell_members e CROSS JOIN cb c"""
        for m in range(_M)
    )
    lut_branches = "\n  UNION ALL\n".join(
        f"""  SELECT {m} AS m, c.cid,
         CAST(round({_dot_range_sql('q.embedding', 'c.cv', m * _SUB + 1, _SUB)} * 1e{_PQ_SCALE}) AS BIGINT) AS v_fp
  FROM q CROSS JOIN cb c"""
        for m in range(_M)
    )
    cos_qc = cosine_sql("q.embedding", "c.cv", _DIM)
    cos_ec = cosine_sql("e.embedding", "c.cv", _DIM)
    cos_final = cosine_sql("e.embedding", "q.embedding", _DIM)
    return f"""
WITH cb AS MATERIALIZED (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id IN ({_CENT_LIST})
),
q AS MATERIALIZED (SELECT embedding FROM embeddings WHERE vec_id = 0),
assign AS MATERIALIZED (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY round({cos_ec}, 9) DESC, c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN cb c
  ) WHERE rn = 1
),
qprobe AS MATERIALIZED (
  SELECT cid AS probe_cell FROM (
    SELECT c.cid, row_number() OVER (ORDER BY round({cos_qc}, 9) DESC, c.cid ASC) AS rn
    FROM q CROSS JOIN cb c
  ) WHERE rn <= {_NPROBE}
),
cell_members AS MATERIALIZED (
  SELECT a.vec_id, a.embedding FROM assign a JOIN qprobe p ON a.cell = p.probe_cell
  WHERE a.vec_id != 0
),
assign_scores AS MATERIALIZED (
{assign_branches}
),
codes AS MATERIALIZED (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid, row_number() OVER (PARTITION BY vec_id, m ORDER BY s DESC, cid ASC) AS rn
    FROM assign_scores
  ) WHERE rn = 1
),
lut AS MATERIALIZED (
{lut_branches}
),
shortlist AS MATERIALIZED (
  SELECT vec_id FROM (
    SELECT c.vec_id, CAST(sum(l.v_fp) AS BIGINT) AS adc_fp
    FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.cid
    GROUP BY c.vec_id
  )
  QUALIFY row_number() OVER (ORDER BY adc_fp DESC, vec_id ASC) <= {_SHORTLIST}
)
SELECT e.vec_id, round({cos_final}, 6) AS sim,
       CAST(row_number() OVER (ORDER BY round({cos_final}, 6) DESC, e.vec_id ASC) AS BIGINT) AS rank
FROM embeddings e JOIN shortlist s ON s.vec_id = e.vec_id CROSS JOIN q
QUALIFY rank <= 10
ORDER BY rank
"""


def ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """One-off IVF-PQ build: coarse cell assignment (cosine to the
    seed cells) persisted partitioned BY cell, and PQ codes (8 bytes
    per vector) persisted for the WHOLE corpus — the production
    layout where the probe scan reads code rows, never vectors."""
    from memories_spark.functions.vectors import dot_expr

    def build(tmp: str) -> None:
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
            .select("vec_id", F.col("cid").alias("cell"))
        )
        assign.write.partitionBy("cell").parquet(os.path.join(tmp, "assign"))

        ms = F.explode(F.array(*[F.lit(m) for m in range(_M)])).alias("m")
        cb = cents.select(ms, "cid", "cv").select(
            "m", "cid", F.expr(f"slice(cv, m * {_SUB} + 1, {_SUB})").alias("cw")
        )
        sub = F.expr(f"slice(embedding, m * {_SUB} + 1, {_SUB})")
        cw2 = Window.partitionBy("vec_id", "m").orderBy(F.desc("s"), F.asc("cid"))
        codes = (
            emb.select("vec_id", "embedding", ms.alias("m"))
            .join(F.broadcast(cb), "m")
            .select(
                "vec_id", "m", "cid", F.round(dot_expr(sub, F.col("cw")), 9).alias("s")
            )
            .withColumn("rn", F.row_number().over(cw2))
            .filter(F.col("rn") == 1)
            .select("vec_id", "m", "cid")
        )
        codes.write.parquet(os.path.join(tmp, "codes"))

    return _ensure_index("ivfpq", sf_dir, build)


@register(
    "ann_ivfpq_rerank",
    oracle=_ivfpq_oracle(),
    bench=True,
    doc="The full production ANN pipeline (FAISS IVF-PQ,re-rank "
    "layout) in one plan: (1) IVF cell pruning — only the 3 nearest "
    "of 16 cells are scanned (~3/16 of the corpus); (2) PQ/ADC "
    "scoring inside those cells — candidates rank by eight LUT "
    "lookups, no float vector math; (3) exact cosine re-rank of the "
    "top-30 ADC shortlist only. At 100 TB the three stages read: "
    "cell partitions (partition pruning), 8-byte code rows, and "
    "thirty full vectors — in that order of magnitude. Uses the "
    "seed-vector coarse cells (ann_ivf_trained's k-means init) with "
    "the codebook of ann_pq_adc; every stage is broadcast-joined "
    "and windowed, fully JVM-side.",
    tags=("vector", "ann", "pq", "flagship"),
)
def ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.functions.vectors import dot_expr

    emb = load_tables(spark, sf_dir)["embeddings"]
    idx = ensure_ivfpq_index(spark, sf_dir)
    assign = read_parquet_memoized(spark, os.path.join(idx, "assign"))
    codes = read_parquet_memoized(spark, os.path.join(idx, "codes"))
    cents = emb.filter(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )

    # (1) IVF probe: the query's 3 nearest cells -> 3 driver scalars
    #     -> partition pruning on the persisted assignment
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    qw = Window.orderBy(F.desc(F.round(cosine_expr("qv", "cv"), 9)), F.asc("cid"))
    probe_cells = [
        r.cid
        for r in q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _NPROBE)
        .select("cid")
        .collect()
    ]
    members = (
        assign.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )

    # (2) PQ/ADC: persisted code rows of the probed cells score as
    #     eight LUT lookups — no vector math per candidate
    ms = F.explode(F.array(*[F.lit(m) for m in range(_M)])).alias("m")
    cb = cents.select(ms, "cid", "cv").select(
        "m", "cid", F.expr(f"slice(cv, m * {_SUB} + 1, {_SUB})").alias("cw")
    )
    qsub = F.expr(f"slice(qv, m * {_SUB} + 1, {_SUB})")
    lut = q.crossJoin(F.broadcast(cb)).select(
        "m", "cid",
        F.round(dot_expr(qsub, F.col("cw")) * F.lit(float(10**_PQ_SCALE)))
        .cast("long")
        .alias("v_fp"),
    )
    shortlist = ranked_topk(
        codes.join(members, "vec_id", "left_semi")
        .join(F.broadcast(lut), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("v_fp").cast("long").alias("adc_fp")),
        [F.desc("adc_fp"), F.asc("vec_id")],
        _SHORTLIST,
        rank_col="rn",
    ).select("vec_id")

    # (3) exact re-rank of the shortlist only
    rw = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        emb.join(shortlist, "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim"))
        .withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------
# Scalar quantization (int8) with exact re-rank
# ---------------------------------------------------------------------

_SQ_SHORTLIST = 30


def _int_dot_sql(a: str, b: str, dim: int) -> str:
    """Pure-integer dot product chain (order-free: BIGINT sum)."""
    return "(" + " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1)) + ")"


_SQ8_ORACLE = f"""
WITH amax AS (
  SELECT max(list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE))))) AS a
  FROM embeddings
),
q8 AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / amax.a) AS BIGINT)) AS qv
  FROM embeddings, amax
),
qq AS (SELECT qv AS query_q FROM q8 WHERE vec_id = 0),
scored AS (
  SELECT q8.vec_id,
         CAST({_int_dot_sql('q8.qv', 'qq.query_q', _DIM)} AS BIGINT) AS approx_ip
  FROM q8, qq WHERE q8.vec_id != 0
),
short AS (
  SELECT vec_id, approx_ip FROM scored
  ORDER BY approx_ip DESC, vec_id ASC LIMIT {_SQ_SHORTLIST}
),
rer AS (
  SELECT s.vec_id, s.approx_ip,
         round({cosine_sql('e.embedding', 'q.embedding', _DIM)}, 6) AS sim
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings q ON q.vec_id = 0
)
SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank,
       vec_id, approx_ip, sim
FROM rer
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""


@register(
    "ann_sq8_rerank",
    oracle=_SQ8_ORACLE,
    bench=True,
    doc="Scalar-quantized (int8) ANN with exact re-rank — the fourth "
    "compression scheme in the family (hash IVF, trained IVF, "
    "PQ/ADC, now SQ8): every vector is quantized to 64 int8 codes "
    "with one global symmetric scale (max |x| over the corpus, a "
    "1-row broadcast), the candidate scan scores PURE-INTEGER dot "
    "products (SIMD-friendly on a real executor, 4x smaller than "
    "float32, and bit-deterministic in any summation order), and "
    "the top-30 shortlist is re-ranked by exact float cosine. "
    "Unlike PQ the codes preserve per-dimension structure, so "
    "approximation error is bounded by the quantization step "
    "rather than codebook quality. Plan: one pass to find the "
    "scale, one map-side quantize + integer-dot scan (zero "
    "shuffles before the top-k), TakeOrdered shortlist, rerank "
    "joins only 30 rows back to full vectors.",
    tags=("ann", "similarity"),
)
def ann_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.functions.vectors import dot_expr  # noqa: F401

    emb = load_tables(spark, sf_dir)["embeddings"]
    amax = emb.agg(
        F.max(
            F.array_max(
                F.transform("embedding", lambda x: F.abs(x.cast("double")))
            )
        ).alias("a")
    )
    q8 = emb.crossJoin(F.broadcast(amax)).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.lit(127.0) / F.col("a")).cast(
                "long"
            ),
        ).alias("qv"),
    )
    qq = q8.filter(F.col("vec_id") == 0).select(F.col("qv").alias("query_q"))
    scored = (
        q8.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with("qv", "query_q", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("approx_ip"),
        )
    )
    short = ranked_topk(
        scored, [F.desc("approx_ip"), F.asc("vec_id")], _SQ_SHORTLIST,
        rank_col="rn",
    ).select("vec_id", "approx_ip")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    rw = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        emb.join(short, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "approx_ip",
            F.round(cosine_expr("embedding", "qe"), 6).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("rank", "vec_id", "approx_ip", "sim")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------
# nprobe recall sweep: the IVF tuning curve
# ---------------------------------------------------------------------

_SWEEP_MAX_NPROBE = 4

_NPROBE_SWEEP_ORACLE = f"""
WITH dims AS (SELECT unnest(range(1, {_DIM + 1})) AS d),
pts AS (
  SELECT e.vec_id, dims.d, CAST(e.embedding[dims.d] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN dims
),
seeds AS (
  SELECT vec_id AS cid, d, x AS c FROM pts WHERE vec_id IN ({_CENT_LIST})
),
d1 AS (
  SELECT p.vec_id, s.cid,
         sum(CAST(round((p.x - s.c)*(p.x - s.c)*1e9) AS BIGINT)) AS dist_fp
  FROM pts p JOIN seeds s ON p.d = s.d GROUP BY p.vec_id, s.cid
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp ASC, cid ASC) AS rk
    FROM d1
  ) WHERE rk = 1
),
cent AS (
  SELECT a1.cid, p.d,
         CAST(sum({fixed_point_sql('p.x', 7)}) AS DOUBLE)/count(*)/10000000.0 AS c
  FROM a1 JOIN pts p ON a1.vec_id = p.vec_id GROUP BY a1.cid, p.d
),
d2 AS (
  SELECT p.vec_id, c.cid,
         sum(CAST(round((p.x - c.c)*(p.x - c.c)*1e9) AS BIGINT)) AS dist_fp
  FROM pts p JOIN cent c ON p.d = c.d GROUP BY p.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp ASC, cid ASC) AS rk
    FROM d2
  ) WHERE rk = 1
),
cellrank AS (
  SELECT cid, row_number() OVER (ORDER BY dist_fp ASC, cid ASC) AS crk
  FROM d2 WHERE vec_id = 0
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
exact10 AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           row_number() OVER (ORDER BY round({cosine_sql('e.embedding', 'q.qv', _DIM)}, 6) DESC, e.vec_id ASC) AS rk
    FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
  ) WHERE rk <= 10
),
grid AS (SELECT unnest(range(1, {_SWEEP_MAX_NPROBE + 1})) AS nprobe),
members AS (
  SELECT g.nprobe, a.vec_id
  FROM grid g
  JOIN cellrank cr ON cr.crk <= g.nprobe
  JOIN assign a ON a.cell = cr.cid
  WHERE a.vec_id != 0
),
ann10 AS (
  SELECT nprobe, vec_id FROM (
    SELECT m.nprobe, m.vec_id,
           row_number() OVER (PARTITION BY m.nprobe
             ORDER BY round({cosine_sql('e.embedding', 'q.qv', _DIM)}, 6) DESC, m.vec_id ASC) AS rk
    FROM members m JOIN embeddings e ON e.vec_id = m.vec_id CROSS JOIN q
  ) WHERE rk <= 10
),
counts AS (
  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_candidates
  FROM members GROUP BY nprobe
)
SELECT c.nprobe, c.n_candidates,
       CAST(count(e.vec_id) AS BIGINT) AS hits_at10,
       round(CAST(count(e.vec_id) AS DOUBLE) / 10.0, 2) AS recall_at10
FROM counts c
LEFT JOIN ann10 a ON a.nprobe = c.nprobe
LEFT JOIN exact10 e ON e.vec_id = a.vec_id
GROUP BY c.nprobe, c.n_candidates
ORDER BY c.nprobe
"""


@register(
    "ann_nprobe_recall_sweep",
    oracle=_NPROBE_SWEEP_ORACLE,
    doc="The IVF tuning curve a production ANN deployment sizes "
    "itself with: for nprobe = 1..4 over the persisted trained "
    "index, report the candidate volume scanned and recall@10 "
    "against the exact brute-force top-10 — the cost/recall "
    "trade-off as one oracle-checked table (FAISS's nprobe sweep; "
    "reference R1 served by Qdrant exposes the same knob as "
    "hnsw_ef). Plan: the probe ranking joins the persisted "
    "cell-partitioned assignment once; the nprobe grid is a 4-row "
    "broadcast; per-nprobe top-10s are partitioned windows over the "
    "shared candidate scan; recall joins a 10-row broadcast.",
    tags=("vector", "ann", "eval"),
)
def ann_nprobe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    idx = ensure_ivf_trained_index(spark, sf_dir)
    cent = read_parquet_memoized(spark, os.path.join(idx, "centroids"))
    assign = read_parquet_memoized(spark, os.path.join(idx, "assign"))

    # the query's cells ranked by distance (16 rows)
    qd = _dists_to(_pts(emb.filter(F.col("vec_id") == 0)), cent)
    cw = Window.orderBy(F.asc("dist_fp"), F.asc("cid"))
    cellrank = qd.select("cid", F.row_number().over(cw).alias("crk")).filter(
        F.col("crk") <= _SWEEP_MAX_NPROBE
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    # exact top-10 (the ground truth): one brute-force scan
    exact10 = ranked_topk(
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim")),
        [F.desc("sim"), F.asc("vec_id")],
        10,
        rank_col="rk",
    ).select("vec_id")

    grid = spark.range(1, _SWEEP_MAX_NPROBE + 1).select(
        F.col("id").cast("int").alias("nprobe")
    )
    members = (
        grid.join(F.broadcast(cellrank), F.col("crk") <= F.col("nprobe"))
        .join(assign, F.col("cell") == F.col("cid"))
        .filter(F.col("vec_id") != 0)
        .select("nprobe", "vec_id")
    )
    aw = Window.partitionBy("nprobe").orderBy(F.desc("sim"), F.asc("vec_id"))
    ann10 = (
        members.join(emb, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "nprobe", "vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim")
        )
        .withColumn("rk", F.row_number().over(aw))
        .filter(F.col("rk") <= 10)
        .select("nprobe", "vec_id")
    )
    counts = members.groupBy("nprobe").agg(F.count("*").alias("n_candidates"))
    hits = (
        ann10.join(F.broadcast(exact10.withColumn("_hit", F.lit(1))), "vec_id", "left")
        .groupBy("nprobe")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("hits_at10"))
    )
    return (
        counts.join(hits, "nprobe", "left")
        .select(
            "nprobe",
            "n_candidates",
            F.coalesce(F.col("hits_at10"), F.lit(0)).cast("long").alias("hits_at10"),
            F.round(
                F.coalesce(F.col("hits_at10"), F.lit(0)).cast("double") / F.lit(10.0), 2
            ).alias("recall_at10"),
        )
        .orderBy("nprobe")
    )
