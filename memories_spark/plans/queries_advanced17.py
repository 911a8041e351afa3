"""Advanced analytics batch 21: snapshot diffing (CDC audit),
Theil-Sen robust trend estimation, and dyadic Katz centrality.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.queries_graph import _TRI_EDGES_CTE, _shifted_edges
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Snapshot diff audit (change-data-capture between table versions)
# ---------------------------------------------------------------------

_DIFF_ORACLE = """
WITH v1 AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 43 != 0
),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 41 = 0 THEN md5(text || ' v2') ELSE md5(text) END
           AS h
  FROM documents WHERE doc_id % 47 != 0
),
joined AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         CASE
           WHEN v1.doc_id IS NULL THEN 'added'
           WHEN v2.doc_id IS NULL THEN 'removed'
           WHEN v1.h != v2.h THEN 'changed'
           ELSE 'unchanged'
         END AS status
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM joined
GROUP BY status
ORDER BY status
"""


@register(
    "snapshot_diff_audit",
    oracle=_DIFF_ORACLE,
    doc="Change-data-capture between two table snapshots: v1 drops "
    "every 43rd doc (rows the new snapshot ADDED), v2 drops every "
    "47th (REMOVED) and perturbs every 41st text (CHANGED — "
    "detected by content-hash inequality, never by comparing full "
    "payloads). The diff is ONE full-outer join on the key with a "
    "4-way CASE — the audit every incremental ingestion runs "
    "before promoting a snapshot, and at 100 TB the hash-compare "
    "trick matters: 16-byte digests shuffle instead of documents. "
    "Deterministic versions are derived in-query so the oracle "
    "replays the same derivation.",
    tags=("ops", "dedup"),
)
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    v1 = docs.filter(F.col("doc_id") % 43 != 0).select(
        "doc_id", F.md5("text").alias("h1")
    )
    v2 = docs.filter(F.col("doc_id") % 47 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 41 == 0,
            F.md5(F.concat(F.col("text"), F.lit(" v2"))),
        )
        .otherwise(F.md5("text"))
        .alias("h2"),
    )
    joined = v1.join(v2, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("h1").isNull(), "added")
        .when(F.col("h2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        joined.groupBy("status")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes, daily counts)
# ---------------------------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
lo AS (SELECT min(d) AS d0 FROM daily),
xy AS (SELECT d - l.d0 AS x, n AS y FROM daily, lo l),
slopes AS (
  SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
  FROM xy a JOIN xy b ON b.x > a.x
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM slopes),
dv AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM slopes GROUP BY s),
cum AS (
  SELECT s, sum(c) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM dv
)
SELECT t.n AS n_pairs,
       round((SELECT min(s) FROM cum WHERE cc * 2 >= t.n), 6)
         AS theil_sen_slope
FROM tot t
"""


@register(
    "theil_sen_trend",
    oracle=_THEILSEN_ORACLE,
    doc="Theil-Sen robust trend of the daily event-count series: the "
    "MEDIAN of all pairwise slopes (y_j - y_i)/(x_j - x_i) — "
    "insensitive to the outlier days that drag OLS "
    "(value_trend_by_type) around. The O(days^2) pair join runs "
    "on the ~30-row daily rollup, never the fact table, so the "
    "quadratic cost is frozen regardless of corpus scale; the "
    "median is the distinct-value cumulative nearest-rank "
    "(cc*2 >= n), the same machinery as the percentile family. "
    "Slope doubles are exact small-integer ratios computed "
    "identically in both engines.",
    tags=("stats", "temporal"),
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        (F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d")
    ).agg(F.count("*").alias("n"))
    lo = daily.agg(F.min("d").alias("d0"))
    xy = daily.crossJoin(F.broadcast(lo)).select(
        (F.col("d") - F.col("d0")).alias("x"), F.col("n").alias("y")
    )
    b = xy.select(F.col("x").alias("bx"), F.col("y").alias("by"))
    slopes = (
        xy.join(b, F.col("bx") > F.col("x"))
        .select(
            (
                (F.col("by") - F.col("y")).cast("double")
                / (F.col("bx") - F.col("x"))
            ).alias("s")
        )
    )
    tot = slopes.agg(F.count("*").alias("n"))
    dv = slopes.groupBy("s").agg(F.count("*").alias("c"))
    cum = dv.select(
        "s",
        F.sum("c")
        .over(Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cc"),
    )
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cc") * 2 >= F.col("n"))
        .agg(F.min("s").alias("m"), F.first("n").alias("n_pairs"))
    )
    return med.select(
        F.col("n_pairs"),
        F.round(F.col("m"), 6).alias("theil_sen_slope"),
    )


# ---------------------------------------------------------------------
# Katz centrality, 3 hops, beta = 1/2 (dyadic-exact)
# ---------------------------------------------------------------------

_KATZ_ORACLE = f"""
WITH edges AS ({_TRI_EDGES_CTE}),
bidir AS (
  SELECT ea AS a, eb AS b FROM edges
  UNION ALL
  SELECT eb AS a, ea AS b FROM edges
),
p1 AS (SELECT b AS id, CAST(count(*) AS BIGINT) AS c FROM bidir GROUP BY b),
p2 AS (
  SELECT e.b AS id, CAST(sum(p1.c) AS BIGINT) AS c
  FROM p1 JOIN bidir e ON e.a = p1.id GROUP BY e.b
),
p3 AS (
  SELECT e.b AS id, CAST(sum(p2.c) AS BIGINT) AS c
  FROM p2 JOIN bidir e ON e.a = p2.id GROUP BY e.b
),
katz AS (
  SELECT p1.id,
         p1.c AS paths1,
         COALESCE(p2.c, 0) AS paths2,
         COALESCE(p3.c, 0) AS paths3,
         4 * p1.c + 2 * COALESCE(p2.c, 0) + COALESCE(p3.c, 0) AS k_fp
  FROM p1 LEFT JOIN p2 ON p1.id = p2.id LEFT JOIN p3 ON p1.id = p3.id
)
SELECT id, CAST(paths1 AS BIGINT) AS paths1, CAST(paths2 AS BIGINT) AS paths2,
       CAST(paths3 AS BIGINT) AS paths3,
       round(CAST(k_fp AS DOUBLE) / 8.0, 3) AS katz
FROM katz
ORDER BY k_fp DESC, id ASC
LIMIT 20
"""


@register(
    "katz_centrality",
    oracle=_KATZ_ORACLE,
    doc="Katz centrality truncated at 3 hops with attenuation beta = "
    "1/2: c(v) = sum_k beta^k * (walks of length k ending at v) — "
    "the walk-counting centrality that complements degree (k=1), "
    "harmonic (distance-based) and PageRank (stationary) in the "
    "graph family. Walk counts are pure BIGINTs propagated by two "
    "join+groupBy rounds (each a matrix-vector multiply on edge "
    "keys), and the dyadic beta makes the weighted sum an exact "
    "integer 4*p1 + 2*p2 + p3 over denominator 8 — no float "
    "enters until display. Top-20 via the integer key.",
    tags=("graph",),
)
def katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id")
    edges = _shifted_edges(ids, 20).unionByName(_shifted_edges(ids, 40))
    bidir = edges.select(
        F.col("ea").alias("a"), F.col("eb").alias("b")
    ).unionByName(edges.select(F.col("eb").alias("a"), F.col("ea").alias("b")))
    p1 = bidir.groupBy(F.col("b").alias("id")).agg(F.count("*").alias("c1"))
    p2 = (
        p1.join(bidir, p1["id"] == bidir["a"])
        .groupBy(F.col("b").alias("id"))
        .agg(F.sum("c1").alias("c2"))
    )
    p3 = (
        p2.join(bidir, p2["id"] == bidir["a"])
        .groupBy(F.col("b").alias("id"))
        .agg(F.sum("c2").alias("c3"))
    )
    katz = (
        p1.join(p2, "id", "left")
        .join(p3, "id", "left")
        .select(
            "id",
            F.col("c1").alias("paths1"),
            F.coalesce("c2", F.lit(0)).alias("paths2"),
            F.coalesce("c3", F.lit(0)).alias("paths3"),
            (
                4 * F.col("c1")
                + 2 * F.coalesce("c2", F.lit(0))
                + F.coalesce("c3", F.lit(0))
            ).alias("k_fp"),
        )
    )
    return (
        katz.orderBy(F.col("k_fp").desc(), F.col("id").asc())
        .limit(20)
        .select(
            "id",
            "paths1",
            "paths2",
            "paths3",
            F.round(F.col("k_fp").cast("double") / 8.0, 3).alias("katz"),
        )
    )
