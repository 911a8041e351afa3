"""Advanced analytics batch: time-series smoothing, skyline, iterative
ML refinement, link prediction, and distribution diagnostics.

Every query keeps the repo's determinism contract (registry module
docstring): fixed-point integer sums for every float aggregation,
explicit id tie-breaks on every rank, and a DuckDB oracle that
evaluates the identical arithmetic. Scale notes per query explain why
each plan survives a 1000-executor / 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import fixed_point, fixed_point_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# EWMA over each user's recent events (exact dyadic weights)
# ---------------------------------------------------------------------
#
# alpha = 0.5 makes every weight a power of two, so the weighted sum
# is exact in BIGINT after scaling by 2^21: value micros * 2^(21-rn)
# for the rn-th most recent event (rn <= 20). The denominator
# sum(2^(21-rn), rn=1..n) = 2^21 - 2^(21-n) is closed-form — no float
# accumulation anywhere until the final division.

_EWMA_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  QUALIFY rn <= 20
),
agg AS (
  SELECT user_id,
         sum({fixed_point_sql('value', 6)} * CAST(power(2.0, 21 - rn) AS BIGINT)) AS s,
         count(*) AS n
  FROM ranked GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(CAST(s AS DOUBLE) / (2097152.0 - power(2.0, CAST(21 - n AS DOUBLE))) / 1000000.0, 6) AS ewma_value
FROM agg ORDER BY user_id
"""


@register(
    "ewma_user_value",
    oracle=_EWMA_ORACLE,
    doc="Exponentially weighted moving average (alpha=0.5) of each "
    "user's 20 most recent event values. Dyadic weights keep the "
    "whole computation in exact BIGINT arithmetic (weight 2^(21-rn), "
    "closed-form denominator), so the smoothed value is bit-identical "
    "across engines and partitionings. One shuffle on user_id; the "
    "per-user top-20 window bounds state regardless of corpus size — "
    "the decayed-signal twin of the reference's recency scoring "
    "(memory_engine.py:1442-1465) applied to event streams.",
    tags=("window", "events", "timeseries"),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = ev.select(
        "user_id", "value", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 20)
    term = fixed_point(F.col("value"), 6) * F.pow(
        F.lit(2.0), (F.lit(21) - F.col("rn")).cast("double")
    ).cast("long")
    agg = ranked.groupBy("user_id").agg(
        F.sum(term).alias("s"), F.count("*").alias("n")
    )
    denom = F.lit(2097152.0) - F.pow(F.lit(2.0), (F.lit(21) - F.col("n")).cast("double"))
    return agg.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("s").cast("double") / denom / F.lit(1000000.0), 6).alias("ewma_value"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------
# Skyline (Pareto frontier) of parts: cheapest-for-their-size set
# ---------------------------------------------------------------------
#
# A part pair (price, size) is on the frontier iff no other pair has
# price <= it AND size >= it with at least one strict. After
# collapsing to distinct pairs, a single sorted sweep (price ASC,
# size DESC) finds the frontier: a pair survives iff its size exceeds
# the running max size of all earlier pairs. The sweep is provably
# equivalent to the NOT EXISTS dominance test the oracle runs.

_PARETO_ORACLE = """
WITH pairs AS (
  SELECT CAST(round(p_retailprice*100.0) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS p_size,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT round(CAST(price_c AS DOUBLE)/100.0, 2) AS retail_price, p_size, n_parts
FROM pairs a
WHERE NOT EXISTS (
  SELECT 1 FROM pairs b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size)
)
ORDER BY retail_price
"""


@register(
    "pareto_frontier_parts",
    oracle=_PARETO_ORACLE,
    doc="Skyline query: parts not dominated on (min price, max size). "
    "The oracle states the O(n^2) NOT-EXISTS dominance definition; "
    "the Spark plan computes the same set with one groupBy (distinct "
    "pairs) + one running-max window sweep over the collapsed pairs — "
    "O(distinct pairs log) instead of a quadratic self-join, the "
    "rewrite that makes skylines feasible at 100 TB (the window runs "
    "over the tiny distinct-pair set, not the fact table).",
    tags=("window", "skyline"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir)["part"]
    pairs = part.groupBy(
        fixed_point(F.col("p_retailprice"), 2).alias("price_c"),
        F.col("p_size").cast("long").alias("p_size"),
    ).agg(F.count("*").alias("n_parts"))
    w = Window.orderBy(F.asc("price_c"), F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    swept = pairs.withColumn("max_prev", F.max("p_size").over(w))
    return (
        swept.filter(F.col("max_prev").isNull() | (F.col("p_size") > F.col("max_prev")))
        .select(
            F.round(F.col("price_c").cast("double") / 100.0, 2).alias("retail_price"),
            "p_size",
            F.col("n_parts").cast("long").alias("n_parts"),
        )
        .orderBy("retail_price")
    )


# ---------------------------------------------------------------------
# TPC-H Q21 shape: the sole supplier who shipped last on shared orders
# ---------------------------------------------------------------------

_Q21_ORACLE = """
WITH ord AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey
),
at_max AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN ord o ON l.l_orderkey = o.l_orderkey AND l.l_shipdate = o.max_ship
  WHERE o.n_supp >= 2
  GROUP BY l.l_orderkey, l.l_suppkey
),
sole AS (
  SELECT l_orderkey, min(l_suppkey) AS l_suppkey
  FROM at_max GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM sole j JOIN supplier s ON j.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


@register(
    "q21_waiting_supplier",
    oracle=_Q21_ORACLE,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting), adapted "
    "to the testdata schema: on multi-supplier orders, count per "
    "supplier the orders where it alone shipped last. The classic "
    "formulation is EXISTS + NOT EXISTS correlated self-joins; this "
    "plan replaces both with two Window passes over ONE shuffle on "
    "l_orderkey (max shipdate + distinct-supplier sets per order), "
    "then a broadcast supplier join — three scans of lineitem become "
    "one, the rewrite that matters when lineitem is 100 TB.",
    tags=("window", "join", "tpch"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    staged = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    staged = staged.withColumn(
        "n_supp_at_max",
        F.size(
            F.collect_set(
                F.when(F.col("l_shipdate") == F.col("max_ship"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    sole = (
        staged.filter(
            (F.col("n_supp") >= 2)
            & (F.col("n_supp_at_max") == 1)
            & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .dropDuplicates(["l_orderkey", "l_suppkey"])
    )
    counts = sole.groupBy("l_suppkey").agg(F.count("*").alias("numwait"))
    return (
        counts.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", F.col("numwait").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------
# Day-of-week seasonality index per event type
# ---------------------------------------------------------------------

_SEASONALITY_ORACLE = f"""
WITH per AS (
  SELECT event_type, strftime(ts, '%a') AS dow,
         sum({fixed_point_sql('value', 6)}) AS s, count(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(s) AS st, sum(c) AS ct FROM per GROUP BY 1)
SELECT p.event_type, p.dow, CAST(p.c AS BIGINT) AS n,
       round(CAST(p.s AS DOUBLE)/p.c/1000000.0, 6) AS avg_value,
       round((CAST(p.s AS DOUBLE)/p.c) / (CAST(t.st AS DOUBLE)/t.ct), 6) AS dow_index
FROM per p JOIN tot t ON p.event_type = t.event_type
ORDER BY p.event_type, p.dow
"""


@register(
    "seasonality_dow_index",
    oracle=_SEASONALITY_ORACLE,
    doc="Day-of-week seasonality: per (event_type, weekday) average "
    "value as a ratio to the type's overall average. Two aggregation "
    "levels derived from ONE partial aggregate (the per-type total "
    "re-aggregates the small per-dow rollup, never rescanning "
    "events), joined back broadcast — the time-series seasonal-index "
    "shape on top of the reference's period-bucketed analytics "
    "(usage_tracker.py:364-445). Exact micro-scaled sums.",
    tags=("agg", "events", "timeseries"),
)
def seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    per = ev.groupBy(
        "event_type", F.date_format("ts", "EEE").alias("dow")
    ).agg(F.sum(fixed_point(F.col("value"), 6)).alias("s"), F.count("*").alias("c"))
    tot = per.groupBy("event_type").agg(
        F.sum("s").alias("st"), F.sum("c").alias("ct")
    )
    avg_d = F.col("s").cast("double") / F.col("c")
    avg_t = F.col("st").cast("double") / F.col("ct")
    return (
        per.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("c").cast("long").alias("n"),
            F.round(avg_d / F.lit(1000000.0), 6).alias("avg_value"),
            F.round(avg_d / avg_t, 6).alias("dow_index"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------
# Inter-order gap profile (lag diffs + scale-safe nearest-rank)
# ---------------------------------------------------------------------
#
# Percentiles over gaps avoid a global row sort: gaps collapse to
# distinct (gap, count) pairs first, and the cumulative window runs
# over that tiny value-domain table — nearest-rank value = min gap
# whose cumulative count reaches ceil(p*n).

_GAP_ORACLE = """
WITH gaps AS (
  SELECT date_diff('day',
           CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders
  QUALIFY gap IS NOT NULL
),
dist AS (SELECT gap, count(*) AS c FROM gaps GROUP BY gap),
cum AS (
  SELECT gap, c,
         sum(c) OVER (ORDER BY gap ASC) AS cum,
         sum(c) OVER () AS n,
         sum(gap * c) OVER () AS tot
  FROM dist
)
SELECT CAST(max(n) AS BIGINT) AS n_gaps,
       round(CAST(max(tot) AS DOUBLE)/max(n), 6) AS avg_gap_days,
       CAST(min(CASE WHEN cum >= ceil(0.50*n) THEN gap END) AS BIGINT) AS p50_gap,
       CAST(min(CASE WHEN cum >= ceil(0.90*n) THEN gap END) AS BIGINT) AS p90_gap
FROM cum
"""


@register(
    "interorder_gap_profile",
    oracle=_GAP_ORACLE,
    doc="Distribution of days between consecutive orders per "
    "customer: lag-diff window (one shuffle on o_custkey), then "
    "percentiles via the distinct-value cumulative trick — the "
    "global window orders only the distinct gap values (hundreds), "
    "never the fact rows, so the nearest-rank p50/p90 needs no "
    "single-partition sort of 100 TB. Gap days are exact integers; "
    "the mean is an exact BIGINT ratio.",
    tags=("window", "percentile", "timeseries"),
)
def interorder_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    gaps = (
        orders.select(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate")).over(w).cast("date"),
            ).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    dist = gaps.groupBy("gap").agg(F.count("*").alias("c"))
    wcum = Window.orderBy(F.asc("gap")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = dist.select(
        "gap",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
        F.sum(F.col("gap") * F.col("c")).over(wall).alias("tot"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("gap"))
    )
    return cum.agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.round(F.max("tot").cast("double") / F.max("n"), 6).alias("avg_gap_days"),
        pick(0.50).cast("long").alias("p50_gap"),
        pick(0.90).cast("long").alias("p90_gap"),
    )


# ---------------------------------------------------------------------
# Embedding centroid drift between two corpus halves
# ---------------------------------------------------------------------

_DRIFT_ORACLE = f"""
WITH dims AS (SELECT unnest(range(1, 65)) AS d),
comp AS (
  SELECT e.label, dims.d, e.vec_id, CAST(e.embedding[dims.d] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN dims
),
g AS (
  SELECT label, d,
         sum(CASE WHEN vec_id % 2 = 0 THEN {fixed_point_sql('x', 7)} END) AS sa,
         count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS ca,
         sum(CASE WHEN vec_id % 2 = 1 THEN {fixed_point_sql('x', 7)} END) AS sb,
         count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS cb
  FROM comp GROUP BY label, d
),
terms AS (
  SELECT label, ca, cb,
         CAST(round((CAST(sa AS DOUBLE)/ca/10000000.0) * (CAST(sb AS DOUBLE)/cb/10000000.0) * 1e12) AS BIGINT) AS ab,
         CAST(round((CAST(sa AS DOUBLE)/ca/10000000.0) * (CAST(sa AS DOUBLE)/ca/10000000.0) * 1e12) AS BIGINT) AS aa,
         CAST(round((CAST(sb AS DOUBLE)/cb/10000000.0) * (CAST(sb AS DOUBLE)/cb/10000000.0) * 1e12) AS BIGINT) AS bb
  FROM g WHERE ca > 0 AND cb > 0
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(max(ca) AS BIGINT) AS n_even, CAST(max(cb) AS BIGINT) AS n_odd,
       round((CAST(sum(ab) AS DOUBLE)/1e12)
             / (sqrt(CAST(sum(aa) AS DOUBLE)/1e12) * sqrt(CAST(sum(bb) AS DOUBLE)/1e12)), 6) AS centroid_cosine
FROM terms GROUP BY label ORDER BY label
"""


@register(
    "embedding_centroid_drift",
    oracle=_DRIFT_ORACLE,
    doc="Embedding drift monitor: split the corpus into two halves "
    "(vec_id parity plays old/new snapshot), compute each label's "
    "centroid per half, report the cosine between the paired "
    "centroids — the model-regression check run before swapping in a "
    "re-embedded corpus (reference C9 re-embed migration, "
    "memory_engine.py:2887-2971). Dimension-exploded exact sums: "
    "64 rows per vector shuffle once on (label, dim); centroid "
    "components and their products are fixed-point so the cosine is "
    "reproducible under any partitioning.",
    tags=("vector", "agg", "maintenance"),
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    comp = emb.select(
        "label",
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("d"),
        "embedding",
    ).select(
        "label",
        "vec_id",
        "d",
        F.element_at("embedding", F.col("d")).cast("double").alias("x"),
    )
    even = F.col("vec_id") % 2 == 0
    g = comp.groupBy("label", "d").agg(
        F.sum(F.when(even, fixed_point(F.col("x"), 7))).alias("sa"),
        F.count(F.when(even, F.lit(1))).alias("ca"),
        F.sum(F.when(~even, fixed_point(F.col("x"), 7))).alias("sb"),
        F.count(F.when(~even, F.lit(1))).alias("cb"),
    ).filter((F.col("ca") > 0) & (F.col("cb") > 0))
    a = F.col("sa").cast("double") / F.col("ca") / F.lit(10000000.0)
    b = F.col("sb").cast("double") / F.col("cb") / F.lit(10000000.0)
    terms = g.select(
        "label",
        "ca",
        "cb",
        F.round(a * b * F.lit(1e12)).cast("long").alias("ab"),
        F.round(a * a * F.lit(1e12)).cast("long").alias("aa"),
        F.round(b * b * F.lit(1e12)).cast("long").alias("bb"),
    )
    return (
        terms.groupBy("label")
        .agg(
            F.max("ca").cast("long").alias("n_even"),
            F.max("cb").cast("long").alias("n_odd"),
            F.round(
                (F.sum("ab").cast("double") / F.lit(1e12))
                / (
                    F.sqrt(F.sum("aa").cast("double") / F.lit(1e12))
                    * F.sqrt(F.sum("bb").cast("double") / F.lit(1e12))
                ),
                6,
            ).alias("centroid_cosine"),
        )
        .select(F.col("label").cast("long").alias("label"), "n_even", "n_odd", "centroid_cosine")
        .orderBy("label")
    )


# ---------------------------------------------------------------------
# Adamic-Adar link prediction over the derived document graph
# ---------------------------------------------------------------------

_EDGES_SQL = """
  SELECT a.doc_id AS s, a.doc_id + 20 AS t
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 20
  UNION ALL
  SELECT a.doc_id, a.doc_id + 40
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 40
"""

_AA_ORACLE = f"""
WITH edges AS ({_EDGES_SQL}),
adj AS (SELECT s AS n, t AS v FROM edges UNION SELECT t, s FROM edges),
deg AS (SELECT n, count(*) AS deg FROM adj GROUP BY n),
cand AS (
  SELECT a1.v AS ida, a2.v AS idb, a1.n AS via
  FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.v < a2.v
),
existing AS (SELECT least(s, t) AS ida, greatest(s, t) AS idb FROM edges),
scored AS (
  SELECT c.ida, c.idb, CAST(round(1e12 / ln(d.deg)) AS BIGINT) AS t_fp
  FROM cand c JOIN deg d ON c.via = d.n
  WHERE NOT EXISTS (
    SELECT 1 FROM existing e WHERE e.ida = c.ida AND e.idb = c.idb
  )
)
SELECT ida, idb, CAST(count(*) AS BIGINT) AS n_common,
       round(CAST(sum(t_fp) AS DOUBLE)/1e12, 6) AS aa_score
FROM scored GROUP BY ida, idb
ORDER BY aa_score DESC, ida ASC, idb ASC
LIMIT 20
"""


@register(
    "adamic_adar_link_prediction",
    oracle=_AA_ORACLE,
    doc="Link prediction on the document graph: for non-adjacent "
    "pairs sharing neighbors, Adamic-Adar score sum(1/ln(deg(w))) "
    "over common neighbors w — the principled version of the "
    "reference's auto-linking heuristic (llm_extract.py:730-772). "
    "Plan: adjacency self-join keyed on the shared neighbor (the "
    "standard 2-path enumeration; a hub node fans out deg^2 pairs, "
    "so production runs cap or salt top-degree hubs), broadcast "
    "degree join, anti-join against existing edges, fixed-point "
    "term sums.",
    tags=("graph", "join"),
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    ids = docs.select(F.col("doc_id").alias("_b"))

    def shifted(k: int) -> DataFrame:
        return (
            docs.select(F.col("doc_id").alias("s"), (F.col("doc_id") + k).alias("t"))
            .join(ids, F.col("t") == F.col("_b"))
            .select("s", "t")
        )

    edges = shifted(20).unionByName(shifted(40))
    adj = (
        edges.select(F.col("s").alias("n"), F.col("t").alias("v"))
        .unionByName(edges.select(F.col("t").alias("n"), F.col("s").alias("v")))
        .dropDuplicates(["n", "v"])
    )
    deg = adj.groupBy("n").agg(F.count("*").alias("deg"))
    a1 = adj.select(F.col("n").alias("via"), F.col("v").alias("ida"))
    a2 = adj.select(F.col("n").alias("via2"), F.col("v").alias("idb"))
    cand = a1.join(
        a2, (F.col("via") == F.col("via2")) & (F.col("ida") < F.col("idb"))
    ).select("ida", "idb", "via")
    existing = edges.select(
        F.least("s", "t").alias("ida"), F.greatest("s", "t").alias("idb")
    )
    scored = (
        cand.join(existing, ["ida", "idb"], "left_anti")
        .join(F.broadcast(deg), F.col("via") == F.col("n"))
        .select(
            "ida",
            "idb",
            F.round(F.lit(1e12) / F.log(F.col("deg").cast("double"))).cast("long").alias("t_fp"),
        )
    )
    return (
        scored.groupBy("ida", "idb")
        .agg(
            F.count("*").alias("n_common"),
            F.round(F.sum("t_fp").cast("double") / F.lit(1e12), 6).alias("aa_score"),
        )
        .select("ida", "idb", F.col("n_common").cast("long").alias("n_common"), "aa_score")
        .orderBy(F.desc("aa_score"), F.asc("ida"), F.asc("idb"))
        .limit(20)
    )


# ---------------------------------------------------------------------
# One Lloyd refinement step of k-means over the embedding corpus
# ---------------------------------------------------------------------

_KM_SEED_IDS = [7 + 30 * i for i in range(16)]
_KM_SEED_LIST = ", ".join(str(i) for i in _KM_SEED_IDS)

_KMEANS_ORACLE = f"""
WITH dims AS (SELECT unnest(range(1, 65)) AS d),
pts AS (
  SELECT e.vec_id, dims.d, CAST(e.embedding[dims.d] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN dims
),
seeds AS (
  SELECT vec_id AS cid, d, x AS c FROM pts WHERE vec_id IN ({_KM_SEED_LIST})
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
a2 AS (
  SELECT vec_id, cid, dist_fp FROM (
    SELECT vec_id, cid, dist_fp,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp ASC, cid ASC) AS rk
    FROM d2
  ) WHERE rk = 1
),
nb AS (SELECT cid, count(*) AS n_before FROM a1 GROUP BY cid),
na AS (
  SELECT cid, count(*) AS n_after, sum(dist_fp) AS inertia_fp
  FROM a2 GROUP BY cid
)
SELECT s.cid AS cluster_id,
       CAST(coalesce(nb.n_before, 0) AS BIGINT) AS n_before,
       CAST(coalesce(na.n_after, 0) AS BIGINT) AS n_after,
       round(CAST(coalesce(na.inertia_fp, 0) AS DOUBLE)/1e9, 6) AS inertia_after
FROM (SELECT DISTINCT cid FROM seeds) s
LEFT JOIN nb ON s.cid = nb.cid
LEFT JOIN na ON s.cid = na.cid
ORDER BY cluster_id
"""


@register(
    "kmeans_refine_step",
    oracle=_KMEANS_ORACLE,
    doc="One full Lloyd iteration of k-means (k=16, squared-L2): "
    "assign every vector to its nearest seed centroid, recompute "
    "centroids as exact per-dimension means, reassign, report per- "
    "cluster sizes before/after plus the post-step inertia. The "
    "iterative-ML shape the ANN IVF family trains its cells with, "
    "expressed as pure DataFrame ops: dimension-exploded distance "
    "terms sum as BIGINTs so the argmin is deterministic; each "
    "assignment pass is one shuffle on (vec_id) and centroids flow "
    "back as a broadcast-sized (k x 64) table. At 100 TB, points x "
    "k x dims stays linear in the corpus because k*dims rows "
    "broadcast instead of joining.",
    tags=("vector", "ml", "iterative"),
)
def kmeans_refine_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    pts = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("d"),
        "embedding",
    ).select(
        "vec_id", "d", F.element_at("embedding", F.col("d")).cast("double").alias("x")
    )
    seeds = pts.filter(F.col("vec_id").isin(_KM_SEED_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("d").alias("sd"), F.col("x").alias("c")
    )

    def assign(points: DataFrame, cents: DataFrame, keep_dist: bool) -> DataFrame:
        dist = (
            points.join(F.broadcast(cents), points.d == cents.sd)
            .select(
                "vec_id",
                "cid",
                F.round((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")) * F.lit(1e9))
                .cast("long")
                .alias("t_fp"),
            )
            .groupBy("vec_id", "cid")
            .agg(F.sum("t_fp").alias("dist_fp"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist_fp"), F.asc("cid"))
        out = dist.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
        cols = ["vec_id", "cid"] + (["dist_fp"] if keep_dist else [])
        return out.select(*cols)

    a1 = assign(pts, seeds, keep_dist=False)
    cent = (
        a1.join(pts, "vec_id")
        .groupBy("cid", "d")
        .agg(F.sum(fixed_point(F.col("x"), 7)).alias("s"), F.count("*").alias("cnt"))
        .select(
            "cid",
            F.col("d").alias("sd"),
            (F.col("s").cast("double") / F.col("cnt") / F.lit(10000000.0)).alias("c"),
        )
    )
    a2 = assign(pts, cent, keep_dist=True)
    nb = a1.groupBy("cid").agg(F.count("*").alias("n_before"))
    na = a2.groupBy("cid").agg(
        F.count("*").alias("n_after"), F.sum("dist_fp").alias("inertia_fp")
    )
    base = seeds.select("cid").distinct()
    return (
        base.join(nb, "cid", "left")
        .join(na, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            F.coalesce(F.col("n_before"), F.lit(0)).cast("long").alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
            F.round(
                F.coalesce(F.col("inertia_fp"), F.lit(0)).cast("double") / F.lit(1e9), 6
            ).alias("inertia_after"),
        )
        .orderBy("cluster_id")
    )
