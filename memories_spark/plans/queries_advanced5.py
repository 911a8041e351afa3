"""Advanced analytics batch 9: lexical density, cross-series
correlation, sequence n-gram mining, local clustering coefficients,
bipartite projection, and join-key skew diagnostics.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.texttools import bounded_seq, tokens_expr, tokens_sql
from memories_spark.plans.queries_graph import _TRI_EDGES_CTE, _shifted_edges
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Lexical density / type-token profile per document
# ---------------------------------------------------------------------

_LEXDEN_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS t FROM documents
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT t) AS BIGINT) AS n_types,
         CAST(sum(length(t)) AS BIGINT) AS char_sum,
         CAST(sum(CASE WHEN length(t) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_long
  FROM toked GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types,
       round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
       round(CAST(char_sum AS DOUBLE) / n_tokens, 6) AS avg_word_len,
       round(CAST(n_long AS DOUBLE) / n_tokens, 6) AS long_word_share
FROM per_doc
ORDER BY doc_id
"""


@register(
    "lexical_density_profile",
    oracle=_LEXDEN_ORACLE,
    doc="Per-document lexical-density metrics: type-token ratio, mean "
    "word length, and long-word share — the LIX/readability family "
    "of quality signals restated for a corpus without sentence "
    "punctuation (complements repetition_profile and "
    "lang_quality_profile as pre-training filters). Everything "
    "derives from BIGINT counts in ONE groupBy over the exploded "
    "token stream; ratios divide only at output. At scale this is "
    "a map-side-combinable aggregation keyed by doc_id — the "
    "partitioning documents already arrive in.",
    tags=("text", "quality", "training"),
)
def lexical_density_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", F.explode(tokens_expr("text")).alias("t"))
    per_doc = toked.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("t").alias("n_types"),
        F.sum(F.length("t")).alias("char_sum"),
        F.sum(F.when(F.length("t") >= 6, 1).otherwise(0)).alias("n_long"),
    )
    n = F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") / n, 6).alias("type_token_ratio"),
        F.round(F.col("char_sum") / n, 6).alias("avg_word_len"),
        F.round(F.col("n_long") / n, 6).alias("long_word_share"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------
# Cross-correlation between two event-type series (lead/lag discovery)
# ---------------------------------------------------------------------

_XCORR_LAGS = tuple(range(-6, 7))

_XCORR_ORACLE = f"""
WITH hrs AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h
  FROM events WHERE event_type IN ('view', 'purchase')
),
c AS (SELECT event_type, h, count(*) AS n FROM hrs GROUP BY event_type, h),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds),
x AS (
  SELECT s.h, COALESCE(c.n, 0) AS n FROM spine s
  LEFT JOIN c ON s.h = c.h AND c.event_type = 'view'
),
y AS (
  SELECT s.h, COALESCE(c.n, 0) AS n FROM spine s
  LEFT JOIN c ON s.h = c.h AND c.event_type = 'purchase'
),
lags AS (SELECT unnest([{", ".join(str(lag) for lag in _XCORR_LAGS)}]) AS lag),
pairs AS (
  SELECT l.lag, x.n AS xv, y.n AS yv
  FROM lags l JOIN x ON TRUE JOIN y ON y.h = x.h + l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         CAST(sum(xv * yv) AS BIGINT) AS sxy,
         CAST(sum(xv * xv) AS BIGINT) AS sxx,
         CAST(sum(yv * yv) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT lag, n AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS xcorr
FROM m
ORDER BY lag
"""


@register(
    "view_purchase_crosscorr",
    oracle=_XCORR_ORACLE,
    doc="Cross-correlation between the hourly view series and the "
    "hourly purchase series at lags -6..+6 — the lead/lag "
    "discovery tool (does purchasing trail viewing, and by how "
    "many hours?) that generalizes hourly_acf to two series. Both "
    "series densify over one shared hour spine so zeros are "
    "honest; Pearson per lag is exact BIGINT moments; the 13-row "
    "lag table broadcasts. The raw fact table is collapsed by one "
    "groupBy before anything else touches it.",
    tags=("temporal", "stats"),
)
def view_purchase_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    hrs = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_type",
        (F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"),
    )
    c = hrs.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    bounds = c.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("h"))
    x = spine.join(
        c.filter(F.col("event_type") == "view").select("h", "n"), "h", "left"
    ).select("h", F.coalesce("n", F.lit(0)).alias("xv"))
    y = spine.join(
        c.filter(F.col("event_type") == "purchase").select("h", "n"),
        "h",
        "left",
    ).select(F.col("h").alias("yh"), F.coalesce("n", F.lit(0)).alias("yv"))
    lags = spark.createDataFrame([(lag,) for lag in _XCORR_LAGS], "lag bigint")
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("yh", F.col("h") + F.col("lag"))
        .join(y, "yh")
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        m.select("lag", F.col("n").alias("n_pairs"), F.round(num / den, 6).alias("xcorr"))
        .orderBy("lag")
    )


# ---------------------------------------------------------------------
# Sequence n-gram mining (most common behavioral trigrams)
# ---------------------------------------------------------------------

_TRIGRAM_ORACLE = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
),
grams AS (
  SELECT unnest(list_transform(range(1, greatest(length(seq) - 2, 0) + 1),
                               i -> substr(seq, CAST(i AS INT), 3))) AS trigram
  FROM seqs
)
SELECT trigram, CAST(count(*) AS BIGINT) AS n
FROM grams
GROUP BY trigram
ORDER BY n DESC, trigram ASC
LIMIT 10
"""


@register(
    "event_trigram_mining",
    oracle=_TRIGRAM_ORACLE,
    doc="Behavioral-sequence n-gram mining: the 10 most frequent "
    "3-event sub-sequences across all users' ordered histories — "
    "the frequent-pattern counterpart of event_transition_matrix "
    "(order-1) and user_sequence_pattern (regex matching). The "
    "per-user ordered collapse happens inside one aggregation; "
    "trigram explosion runs on ~users strings, not raw events; "
    "top-10 is a TakeOrderedAndProject over the 125-ish possible "
    "trigrams. One user_id shuffle + one tiny trigram shuffle at "
    "any scale.",
    tags=("temporal", "funnel"),
)
def event_trigram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    rows = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").alias("eid"),
            F.substring("event_type", 1, 1).alias("letter"),
        ).alias("e"),
    )
    seqs = rows.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("e")), lambda e: e["letter"]),
            "",
        ).alias("seq")
    )
    idx = bounded_seq(F.length("seq") - 2)
    grams = seqs.select(
        F.explode(
            F.transform(idx, lambda i: F.col("seq").substr(i, F.lit(3)))
        ).alias("trigram")
    )
    return (
        grams.groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("trigram").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------
# Local clustering coefficient (per-node triangle density)
# ---------------------------------------------------------------------

_LCC_ORACLE = f"""
WITH edges AS ({_TRI_EDGES_CTE}),
bidir AS (
  SELECT ea AS a, eb AS b FROM edges
  UNION ALL
  SELECT eb AS a, ea AS b FROM edges
),
deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS degree FROM bidir GROUP BY a),
tri AS (
  SELECT e1.ea AS a, e1.eb AS b, e2.eb AS c
  FROM edges e1
  JOIN edges e2 ON e1.eb = e2.ea
  JOIN edges e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
),
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
tcount AS (SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM corners GROUP BY id)
SELECT d.id AS doc_id, d.degree,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       round(CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
             / (d.degree * (d.degree - 1)), 6) AS lcc
FROM deg d LEFT JOIN tcount t ON d.id = t.id
WHERE d.degree >= 2
ORDER BY doc_id
"""


@register(
    "local_clustering_coefficient",
    oracle=_LCC_ORACLE,
    doc="Per-node local clustering coefficient over the chain+shortcut "
    "graph: 2*triangles(v) / (deg(v)*(deg(v)-1)), the standard "
    "transitivity measure that extends triangle_count from a "
    "global statistic to a per-node one. Triangles enumerate once "
    "on the ORDERED edge set (each triangle counted exactly once) "
    "and then credit all three corners via a 3-way union — no "
    "per-node neighborhood materialization. Degrees come from the "
    "bidirectional union. Two equi-joins + two groupBys, all on "
    "edge keys; skew is bounded because orientation caps fan-out.",
    tags=("graph",),
)
def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id")
    edges = _shifted_edges(ids, 20).unionByName(_shifted_edges(ids, 40))
    bidir = edges.unionByName(
        edges.select(F.col("eb").alias("ea"), F.col("ea").alias("eb"))
    )
    deg = bidir.groupBy(F.col("ea").alias("id")).agg(
        F.count("*").alias("degree")
    )
    e2 = edges.select(F.col("ea").alias("e2a"), F.col("eb").alias("e2b"))
    e3 = edges.select(F.col("ea").alias("e3a"), F.col("eb").alias("e3b"))
    tri = (
        edges.join(e2, F.col("eb") == F.col("e2a"))
        .join(e3, (F.col("e3a") == F.col("ea")) & (F.col("e3b") == F.col("e2b")))
        .select(F.col("ea").alias("a"), F.col("eb").alias("b"), F.col("e2b").alias("c"))
    )
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    tcount = corners.groupBy("id").agg(F.count("*").alias("n_triangles"))
    joined = deg.join(tcount, "id", "left").filter(F.col("degree") >= 2)
    ntri = F.coalesce(F.col("n_triangles"), F.lit(0))
    return joined.select(
        F.col("id").alias("doc_id"),
        "degree",
        ntri.alias("n_triangles"),
        F.round(
            (2 * ntri).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ).alias("lcc"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------
# Bipartite projection: supplier co-part affinity
# ---------------------------------------------------------------------

_COPART_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
         CAST(count(*) AS BIGINT) AS shared_parts
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey
)
SELECT supp_a, supp_b, shared_parts
FROM pairs
ORDER BY shared_parts DESC, supp_a ASC, supp_b ASC
LIMIT 20
"""


@register(
    "supplier_copart_projection",
    oracle=_COPART_ORACLE,
    doc="Bipartite-graph projection: project the supplier-part "
    "incidence graph onto suppliers, scoring each supplier pair by "
    "shared distinct parts — the co-engagement projection used for "
    "item-item similarity in recommenders. The fact table first "
    "collapses to DISTINCT (part, supplier) so the self-join runs "
    "on the deduplicated incidence list; fan-out per part is "
    "bounded by that part's supplier count (the hub cap), and "
    "ordering supp_a < supp_b halves the pair space. Top-20 via "
    "TakeOrderedAndProject.",
    tags=("graph", "join"),
)
def supplier_copart_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    ps = li.select("l_partkey", "l_suppkey").distinct()
    b = ps.select(
        F.col("l_partkey").alias("bp"), F.col("l_suppkey").alias("supp_b")
    )
    pairs = (
        ps.join(b, (F.col("l_partkey") == F.col("bp")) & (F.col("l_suppkey") < F.col("supp_b")))
        .groupBy(F.col("l_suppkey").alias("supp_a"), "supp_b")
        .agg(F.count("*").alias("shared_parts"))
    )
    return pairs.orderBy(
        F.col("shared_parts").desc(), F.col("supp_a").asc(), F.col("supp_b").asc()
    ).limit(20)


# ---------------------------------------------------------------------
# Join-key skew diagnostic (the ops query behind salting decisions)
# ---------------------------------------------------------------------

def _skew_one_sql(table: str, col: str) -> str:
    return f"""
  SELECT '{col}' AS key_col,
         CAST(sum(c) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_freq,
         round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6) AS skew_ratio
  FROM (SELECT {col}, count(*) AS c FROM {table} GROUP BY {col})
"""


_SKEW_ORACLE = (
    _skew_one_sql("lineitem", "l_orderkey")
    + " UNION ALL "
    + _skew_one_sql("lineitem", "l_partkey")
    + " UNION ALL "
    + _skew_one_sql("lineitem", "l_suppkey")
    + " UNION ALL "
    + _skew_one_sql("orders", "o_custkey")
    + " ORDER BY key_col"
)


@register(
    "join_key_skew_profile",
    oracle=_SKEW_ORACLE,
    doc="Join-key skew diagnostic: for each candidate join key, the "
    "distinct-key count, the heaviest key's frequency, and the "
    "skew ratio max_freq/(mean freq) — the number that decides "
    "between a plain shuffle join, AQE skew splitting, and "
    "explicit salting (heavy_hitter_terms_salted is the cure; "
    "this is the diagnosis). Each key profiles via its own "
    "two-level aggregation (per-key counts, then one-row rollup), "
    "so the plan is a union of map-side-combinable aggs — no "
    "row ever leaves with its full key list.",
    tags=("ops", "stats"),
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = None
    for table, col in (
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ):
        per_key = t[table].groupBy(col).agg(F.count("*").alias("c"))
        one = per_key.agg(
            F.lit(col).alias("key_col"),
            F.sum("c").alias("total_rows"),
            F.count("*").alias("n_keys"),
            F.max("c").alias("max_freq"),
            F.round(
                F.max("c").cast("double") * F.count("*") / F.sum("c"), 6
            ).alias("skew_ratio"),
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("key_col")
