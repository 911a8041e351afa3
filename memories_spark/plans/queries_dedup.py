"""Dedup / similarity-search queries: MinHash LSH, SimHash, n-gram
Jaccard, embedding near-dup pairs, IVF-style bucketed ANN, smart
import, dedup victim selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import char_shingles_expr, tokens_expr
from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.operators import dedup as dedup_op
from memories_spark.operators import graph as graph_op
from memories_spark.operators import similarity as sim_op
from memories_spark.functions.topk import ranked_topk
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# MinHash + LSH near-duplicates
# ---------------------------------------------------------------------

_MINHASH_PAIRS_CTE = dedup_op.minhash_pairs_sql("documents", "doc_id", "text")

_MINHASH_ORACLE = _MINHASH_PAIRS_CTE + """
SELECT id_a, id_b, round(est_sim, 6) AS est_sim
FROM pairs WHERE est_sim >= 0.75
"""


@register(
    "minhash_near_dups",
    oracle=_MINHASH_ORACLE,
    doc="MinHash (8 hashes) + LSH banding (4 bands x 2 rows) "
    "candidate pairs with estimated Jaccard >= 0.75. The scale path "
    "for exact-dup families (reference J3/C1 all-pairs dedup, "
    "memory_engine.py:2199-2272, re-expressed sub-quadratically).",
    tags=("dedup", "minhash"),
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    pairs = dedup_op.minhash_candidate_pairs(docs, "doc_id", "text")
    return pairs.filter(F.col("est_sim") >= 0.75).select(
        "id_a", "id_b", F.round("est_sim", 6).alias("est_sim")
    )


_DELETE_ORACLE = _MINHASH_PAIRS_CTE + """
SELECT DISTINCT id_b AS victim_id
FROM pairs WHERE est_sim >= 0.75
ORDER BY victim_id
"""


@register(
    "dedup_victims",
    oracle=_DELETE_ORACLE,
    bench=True,
    doc="Dedup victim selection: for each near-dup pair keep the "
    "smaller id, delete the larger (reference C1 deduplicate, "
    "memory_engine.py:2239-2272). Computed group-first over distinct "
    "signatures — the quadratic pair list is never materialized.",
    tags=("dedup",),
)
def dedup_victims(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return dedup_op.minhash_dedup_victims(docs, "doc_id", "text", threshold=0.75).orderBy(
        "victim_id"
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

_SIMHASH_ORACLE = f"""
SELECT doc_id, {dedup_op.simhash_sql('text')} AS simhash
FROM documents ORDER BY doc_id
"""


@register(
    "simhash_sketch",
    oracle=_SIMHASH_ORACLE,
    doc="16-bit SimHash sketch per document (token md5-parity votes); "
    "the constant-size near-dup fingerprint family.",
    tags=("dedup", "simhash"),
)
def simhash_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id", dedup_op.simhash_expr("text").alias("simhash")
    ).orderBy("doc_id")


_SIMHASH_PAIRS_ORACLE = f"""
WITH sk AS (
  SELECT doc_id, {dedup_op.simhash_sql('text')} AS simhash FROM documents
),
blocked AS (SELECT doc_id, simhash, substr(simhash, 1, 8) AS blk FROM sk),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         {dedup_op.hamming_sql('a.simhash', 'b.simhash')} AS hamming
  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= 2
"""


@register(
    "simhash_near_dups",
    oracle=_SIMHASH_PAIRS_ORACLE,
    doc="SimHash near-dup pairs: block on the first 8 bits, keep "
    "hamming <= 2. Blocking keeps the pair join sub-quadratic.",
    tags=("dedup", "simhash"),
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    sk = docs.select("doc_id", dedup_op.simhash_expr("text").alias("simhash"))
    blocked = sk.withColumn("blk", F.substring("simhash", 1, 8))
    a = blocked.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sha"), "blk"
    )
    b = blocked.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("shb"), "blk"
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    ham = dedup_op.hamming_expr(F.col("sha"), F.col("shb"))
    return pairs.select(
        "id_a", "id_b", ham.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 2)


# ---------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(1, greatest(length(lower(text)) - 2, 0) + 1),
           i -> substr(lower(text), CAST(i AS INT), 3))) AS s
  FROM documents
),
ex AS (SELECT doc_id, source, len(s) AS n, unnest(s) AS g FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         CAST(count(*) AS BIGINT) AS i
  FROM ex a JOIN ex b ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE), 6) AS jaccard
FROM inter
WHERE round(CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE), 6) >= 0.62
"""


@register(
    "ngram_jaccard_pairs",
    oracle=_JACCARD_ORACLE,
    doc="Character 3-gram Jaccard near-dups, blocked by source "
    "(exact set similarity from integer intersection counts).",
    tags=("dedup", "jaccard"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return dedup_op.jaccard_pairs(
        docs,
        "doc_id",
        shingles=char_shingles_expr("text", 3),
        block=F.col("source"),
        threshold=0.62,
    )


# ---------------------------------------------------------------------
# Embedding near-dups + bucketed ANN
# ---------------------------------------------------------------------

_EMB_DIM = 64
_N_PLANES = 4

_EMB_PAIRS_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         {sim_op.lsh_bucket_sql('embedding', _EMB_DIM, _N_PLANES)} AS b
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({cosine_sql('a.embedding', 'b.embedding', _EMB_DIM)}, 6) AS sim
  FROM bucketed a JOIN bucketed b ON a.b = b.b AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.3
"""


@register(
    "embedding_near_dups",
    oracle=_EMB_PAIRS_ORACLE,
    doc="Embedding-cosine near-dup pairs confined to sign-projection "
    "LSH buckets (4 deterministic hyperplanes) — the sub-quadratic "
    "form of the reference's all-pairs E@E.T scan "
    "(memory_engine.py:2199-2237).",
    tags=("dedup", "vector"),
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    return sim_op.cosine_pairs_blocked(
        emb,
        threshold=0.3,
        block_col=sim_op.lsh_bucket_expr("embedding", _EMB_DIM, _N_PLANES),
    )


_IVF_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         {sim_op.lsh_bucket_sql('embedding', _EMB_DIM, _N_PLANES)} AS b
  FROM embeddings
),
q AS (SELECT vec_id, embedding, b FROM bucketed WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id, round({cosine_sql('c.embedding', 'q.embedding', _EMB_DIM)}, 6) AS sim
  FROM bucketed c JOIN q ON c.b = q.b
  WHERE c.vec_id != 0
)
SELECT vec_id, sim,
       CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
FROM scored
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""


@register(
    "ann_ivf_bucketed",
    oracle=_IVF_ORACLE,
    bench=True,
    doc="IVF/LSH-bucketed approximate nearest neighbors: probe only "
    "the query's bucket (1/16th of the corpus), exact cosine inside. "
    "The 100 TB path where brute force stops being free.",
    tags=("vector", "ann"),
)
def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    bucketed = emb.withColumn(
        "b", sim_op.lsh_bucket_expr("embedding", _EMB_DIM, _N_PLANES)
    )
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("b").alias("qb")
    )
    scored = (
        bucketed.join(F.broadcast(q), F.col("b") == F.col("qb"))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim")
        )
    )
    return ranked_topk(
        scored, [F.desc("sim"), F.asc("vec_id")], 10
    ).orderBy(F.desc("sim"), F.asc("vec_id"))


_MP_BUCKET = sim_op.lsh_bucket_sql("embedding", _EMB_DIM, _N_PLANES)

_MULTIPROBE_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_MP_BUCKET} AS b
  FROM embeddings
),
q AS (
  SELECT unnest({sim_op.multiprobe_buckets_sql('b', _N_PLANES)}) AS probe, embedding
  FROM bucketed WHERE vec_id = 0
),
scored AS (
  SELECT c.vec_id, round({cosine_sql('c.embedding', 'q.embedding', _EMB_DIM)}, 6) AS sim
  FROM bucketed c JOIN q ON c.b = q.probe
  WHERE c.vec_id != 0
)
SELECT vec_id, sim,
       CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
FROM scored
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""


@register(
    "ann_multiprobe",
    oracle=_MULTIPROBE_ORACLE,
    bench=True,
    doc="Multi-probe LSH approximate nearest neighbors: probe the "
    "query's sign-LSH bucket plus every Hamming-distance-1 bucket "
    "(5 of 16 — one straddled hyperplane no longer loses the "
    "neighbor). Measured recall@10 vs brute force: ~0.60 vs ~0.15 "
    "single-probe on the test embeddings (tests/test_ann_recall.py). "
    "The probe set explodes query-side, so the corpus join stays an "
    "exact equi-join on the bucket key — no inequality join at any "
    "scale; candidates are bounded at (n_planes+1)/2^n_planes of "
    "the corpus in expectation.",
    tags=("vector", "ann"),
)
def ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    bucketed = emb.withColumn(
        "b", sim_op.lsh_bucket_expr("embedding", _EMB_DIM, _N_PLANES)
    )
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        F.explode(sim_op.multiprobe_buckets_expr("b", _N_PLANES)).alias("probe"),
    )
    scored = (
        bucketed.join(F.broadcast(q), F.col("b") == F.col("probe"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cosine_expr("embedding", "qv"), 6).alias("sim"))
    )
    return ranked_topk(
        scored, [F.desc("sim"), F.asc("vec_id")], 10
    ).orderBy(F.desc("sim"), F.asc("vec_id"))


# ---------------------------------------------------------------------
# Tightened similarity clusters (reference C2, complete semantics)
# ---------------------------------------------------------------------

_TIGHT_EDGES_CTE = f"""
SELECT id_a AS from_id, id_b AS to_id FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({cosine_sql('a.embedding', 'b.embedding', _EMB_DIM)}, 6) AS sim
  FROM (SELECT vec_id, embedding, {sim_op.lsh_bucket_sql('embedding', _EMB_DIM, _N_PLANES)} AS b
        FROM embeddings) a
  JOIN (SELECT vec_id, embedding, {sim_op.lsh_bucket_sql('embedding', _EMB_DIM, _N_PLANES)} AS b
        FROM embeddings) b
    ON a.b = b.b AND a.vec_id < b.vec_id
) WHERE sim >= 0.3
"""

_TIGHT_NODES_CTE = (
    "SELECT DISTINCT id FROM ("
    "SELECT from_id AS id FROM edges UNION ALL SELECT to_id AS id FROM edges)"
)


def _tightened_oracle() -> str:
    from memories_spark.operators import graph as graph_op

    lp = graph_op.label_propagation_sql(_TIGHT_EDGES_CTE, _TIGHT_NODES_CTE, rounds=4)
    return lp + """,
deg AS (
  SELECT a.from_id AS id, count(*) AS deg
  FROM adj a
  JOIN labels la ON la.id = a.from_id
  JOIN labels lb ON lb.id = a.to_id AND lb.label = la.label
  GROUP BY a.from_id
),
sizes AS (SELECT label, count(*) AS n FROM labels GROUP BY label),
kept AS (
  SELECT l.id, l.label
  FROM labels l
  JOIN deg d ON d.id = l.id
  JOIN sizes s ON s.label = l.label
  WHERE d.deg >= (s.n - 1) / 2.0
)
SELECT label, CAST(count(*) AS BIGINT) AS tight_size
FROM kept GROUP BY label HAVING count(*) >= 2
ORDER BY label
"""


@register(
    "tightened_clusters",
    oracle=_tightened_oracle(),
    doc="Similarity clusters with the reference's tighten step "
    "(find_similar_clusters, memory_engine.py:2274-2342): LSH-blocked "
    "cosine pairs -> bounded min-label components -> drop members "
    "similar to fewer than half of the other members (kills "
    "chain-connected outliers), keep clusters of >= 2. Also the C3 "
    "consolidation-candidate approximation (consolidator.py:36-124).",
    tags=("dedup", "clustering"),
)
def tightened_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.operators import graph as graph_op

    emb = load_tables(spark, sf_dir)["embeddings"]
    pairs = sim_op.cosine_pairs_blocked(
        emb,
        threshold=0.3,
        block_col=sim_op.lsh_bucket_expr("embedding", _EMB_DIM, _N_PLANES),
    )
    edges = pairs.select(
        F.col("id_a").alias("from_id"), F.col("id_b").alias("to_id")
    ).cache()
    nodes = (
        edges.select(F.col("from_id").alias("id"))
        .union(edges.select(F.col("to_id").alias("id")))
        .distinct()
    )
    labels = graph_op.min_label_propagation(edges, nodes, rounds=4).cache()
    bi = graph_op.bidirectional(edges)
    deg = (
        bi.join(labels.select(F.col("id").alias("from_id"), F.col("label").alias("la")), "from_id")
        .join(labels.select(F.col("id").alias("to_id"), F.col("label").alias("lb")), "to_id")
        .filter(F.col("la") == F.col("lb"))
        .groupBy("from_id")
        .agg(F.count("*").alias("deg"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("n"))
    kept = (
        labels.join(deg, labels["id"] == deg["from_id"])
        .join(sizes, "label")
        .filter(F.col("deg") >= (F.col("n") - F.lit(1)) / F.lit(2.0))
    )
    return (
        kept.groupBy("label")
        .agg(F.count("*").alias("tight_size"))
        .filter(F.col("tight_size") >= 2)
        .orderBy("label")
    )


# ---------------------------------------------------------------------
# Smart import (novelty classification)
# ---------------------------------------------------------------------

_SMART_IMPORT_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_distinct(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t != '')) AS ts
  FROM documents
),
incoming AS (SELECT doc_id, len(ts) AS n, unnest(ts) AS tok FROM toks WHERE source = 'src19'),
corpus AS (SELECT doc_id, len(ts) AS n, unnest(ts) AS tok FROM toks WHERE source != 'src19'),
inter AS (
  SELECT i.doc_id AS in_id, c.doc_id AS cand_id, i.n AS ni, c.n AS nc,
         CAST(count(*) AS BIGINT) AS ov
  FROM incoming i JOIN corpus c ON i.tok = c.tok
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT in_id, cand_id,
         round(CAST(ov AS DOUBLE) / CAST(ni + nc - ov AS DOUBLE), 6) AS sim,
         row_number() OVER (PARTITION BY in_id ORDER BY
           round(CAST(ov AS DOUBLE) / CAST(ni + nc - ov AS DOUBLE), 6) DESC, cand_id ASC) AS rn
  FROM inter
),
best AS (SELECT in_id, cand_id, sim FROM scored WHERE rn = 1)
SELECT t.doc_id,
       b.cand_id AS best_match_id,
       coalesce(b.sim, 0.0) AS best_sim,
       CASE WHEN b.sim >= 0.9 THEN 'skip'
            WHEN b.sim >= 0.5 THEN 'borderline'
            ELSE 'add' END AS decision
FROM (SELECT doc_id FROM documents WHERE source = 'src19') t
LEFT JOIN best b ON b.in_id = t.doc_id
ORDER BY t.doc_id
"""


@register(
    "smart_import_classify",
    oracle=_SMART_IMPORT_ORACLE,
    doc="Smart-import novelty bands (reference S5 _import_smart, "
    "memory_engine.py:2564-2637): per incoming doc find the best "
    "corpus match; >=0.9 skip / >=0.5 borderline / else add "
    "(token-Jaccard stands in for embedding cosine; same plan shape).",
    tags=("dedup", "import"),
)
def smart_import_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        "source",
        F.array_distinct(tokens_expr("text")).alias("ts"),
    )
    inc = toks.filter(F.col("source") == "src19").select(
        F.col("doc_id").alias("in_id"), F.size("ts").alias("ni"), F.explode("ts").alias("tok")
    )
    cor = toks.filter(F.col("source") != "src19").select(
        F.col("doc_id").alias("cand_id"), F.size("ts").alias("nc"), F.explode("ts").alias("tok")
    )
    inter = inc.join(cor, "tok").groupBy("in_id", "cand_id", "ni", "nc").agg(
        F.count("*").alias("ov")
    )
    sim = F.round(
        F.col("ov").cast("double") / (F.col("ni") + F.col("nc") - F.col("ov")).cast("double"), 6
    )
    w = Window.partitionBy("in_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    best = (
        inter.select("in_id", "cand_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    incoming_ids = docs.filter(F.col("source") == "src19").select("doc_id")
    decision = (
        F.when(F.col("sim") >= 0.9, "skip")
        .when(F.col("sim") >= 0.5, "borderline")
        .otherwise("add")
    )
    return (
        incoming_ids.join(best, incoming_ids.doc_id == best.in_id, "left")
        .select(
            "doc_id",
            F.col("cand_id").alias("best_match_id"),
            F.coalesce(F.col("sim"), F.lit(0.0)).alias("best_sim"),
            decision.alias("decision"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# End-to-end near-dup dedup plan: pairs -> clusters -> keep/drop
# ---------------------------------------------------------------------

_NEARDUP_EDGES = (
    _MINHASH_PAIRS_CTE
    + "SELECT id_a AS from_id, id_b AS to_id FROM pairs WHERE est_sim >= 0.75"
)

_NEARDUP_PLAN_ORACLE = graph_op.label_propagation_sql(
    _NEARDUP_EDGES,
    "SELECT DISTINCT from_id AS id FROM edges UNION SELECT DISTINCT to_id AS id FROM edges",
    rounds=6,
) + """
SELECT label AS cluster_id,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(min(id) AS BIGINT) AS kept_doc,
       CAST(count(*) - 1 AS BIGINT) AS dropped_docs
FROM labels
GROUP BY label
HAVING count(*) >= 2
ORDER BY cluster_size DESC, cluster_id ASC
LIMIT 20
"""


@register(
    "neardup_cluster_dedup_plan",
    oracle=_NEARDUP_PLAN_ORACLE,
    doc="The full near-dup dedup pipeline as ONE plan: MinHash+LSH "
    "candidate pairs (est Jaccard >= 0.75) -> connected clusters "
    "via bounded min-label propagation (6 rounds — near-dup "
    "clusters are tight cliques, diameter far below that) -> per "
    "cluster, keep the smallest doc_id and count the drops. This is "
    "the headline training-data operation the individual dedup "
    "queries feed: pair generation is sub-quadratic (banded "
    "signature self-join), clustering touches only pair endpoints "
    "(never the corpus), and the keep/drop plan is a tiny grouped "
    "aggregate a MERGE DELETE consumes downstream (reference C1+C2, "
    "memory_engine.py:2239-2342, composed end-to-end).",
    tags=("dedup", "minhash", "clustering", "pipeline"),
)
def neardup_cluster_dedup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    pairs = dedup_op.minhash_candidate_pairs(docs, "doc_id", "text").filter(
        F.col("est_sim") >= 0.75
    )
    edges = pairs.select(
        F.col("id_a").alias("from_id"), F.col("id_b").alias("to_id")
    )
    nodes = (
        edges.select(F.col("from_id").alias("id"))
        .union(edges.select(F.col("to_id").alias("id")))
        .distinct()
    )
    labels = graph_op.min_label_propagation(edges, nodes, rounds=6)
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("id").cast("long").alias("kept_doc"),
            (F.count("*") - 1).cast("long").alias("dropped_docs"),
        )
        .filter(F.col("cluster_size") >= 2)
        .select(
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "kept_doc",
            "dropped_docs",
        )
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------
# Two-signal dedup agreement: text MinHash pairs vs embedding pairs
# ---------------------------------------------------------------------

_TWOSIG_ORACLE = f"""
WITH text_pairs AS MATERIALIZED (
  {_MINHASH_PAIRS_CTE}
  SELECT id_a, id_b FROM pairs WHERE est_sim >= 0.75
),
vec_pairs AS MATERIALIZED (
  WITH bucketed AS (
    SELECT vec_id, embedding,
           {sim_op.lsh_bucket_sql('embedding', _EMB_DIM, _N_PLANES)} AS b
    FROM embeddings
  )
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b ON a.b = b.b AND a.vec_id < b.vec_id
  WHERE round({cosine_sql('a.embedding', 'b.embedding', _EMB_DIM)}, 6) >= 0.3
),
agree AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both
  FROM text_pairs t JOIN vec_pairs v ON t.id_a = v.id_a AND t.id_b = v.id_b
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_text FROM text_pairs),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM vec_pairs)
SELECT nt.n_text AS n_text_pairs,
       nv.n_vec AS n_vector_pairs,
       b.n_both,
       round(CAST(b.n_both AS DOUBLE) / (nt.n_text + nv.n_vec - b.n_both), 6) AS signal_jaccard
FROM nt, nv, agree b
"""


@register(
    "twosignal_dedup_agreement",
    oracle=_TWOSIG_ORACLE,
    doc="Multi-evidence dedup audit: how much do the lexical signal "
    "(MinHash est Jaccard >= 0.75 over word shingles) and the "
    "semantic signal (LSH-blocked embedding cosine >= 0.3) agree on "
    "near-dup pairs? Reports both pair counts, the intersection, "
    "and the Jaccard of the two pair SETS — production dedup gates "
    "on signal agreement before destructive deletes (documents and "
    "embeddings share the 0..N-1 id space, so pair identity joins "
    "directly). Both pair generators are the existing sub-quadratic "
    "blocked plans; the agreement join runs on two small pair "
    "tables.",
    tags=("dedup", "minhash", "vector", "audit"),
)
def twosignal_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    text_pairs = (
        dedup_op.minhash_candidate_pairs(t["documents"], "doc_id", "text")
        .filter(F.col("est_sim") >= 0.75)
        .select("id_a", "id_b")
    )
    vec_pairs = sim_op.cosine_pairs_blocked(
        t["embeddings"],
        threshold=0.3,
        block_col=sim_op.lsh_bucket_expr("embedding", _EMB_DIM, _N_PLANES),
    ).select(F.col("id_a").alias("va"), F.col("id_b").alias("vb"))
    both = text_pairs.join(
        vec_pairs,
        (F.col("id_a") == F.col("va")) & (F.col("id_b") == F.col("vb")),
        "left_semi",
    ).agg(F.count("*").alias("n_both"))
    nt = text_pairs.agg(F.count("*").alias("n_text_pairs"))
    nv = vec_pairs.agg(F.count("*").alias("n_vector_pairs"))
    return (
        nt.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(both))
        .select(
            F.col("n_text_pairs").cast("long").alias("n_text_pairs"),
            F.col("n_vector_pairs").cast("long").alias("n_vector_pairs"),
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_text_pairs") + F.col("n_vector_pairs") - F.col("n_both")),
                6,
            ).alias("signal_jaccard"),
        )
    )
