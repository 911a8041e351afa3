"""Advanced analytics batch 7: corpus diversity, trending top-k,
robust outliers, bounded k-core, and a second stateful streaming
operator under the oracle gate.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Token entropy per source folder (corpus diversity diagnostic)
# ---------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH toks AS (
  SELECT string_split(source, '/')[1] AS folder,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
g AS (SELECT folder, term, count(*) AS tf FROM toks GROUP BY folder, term),
tot AS (SELECT folder, sum(tf) AS total, count(*) AS vocab FROM g GROUP BY folder),
terms AS (
  SELECT g.folder,
         CAST(round((CAST(g.tf AS DOUBLE)/t.total)
                    * ln(CAST(t.total AS DOUBLE)/g.tf) * 1e12) AS BIGINT) AS h_fp
  FROM g JOIN tot t ON g.folder = t.folder
)
SELECT t.folder, CAST(t.total AS BIGINT) AS n_tokens, CAST(t.vocab AS BIGINT) AS vocab,
       round(CAST(sum(h_fp) AS DOUBLE)/1e12, 6) AS entropy,
       CASE WHEN t.vocab > 1
            THEN round(CAST(sum(h_fp) AS DOUBLE)/1e12 / ln(CAST(t.vocab AS DOUBLE)), 6)
            ELSE 0.0 END AS normalized_entropy
FROM terms JOIN tot t ON terms.folder = t.folder
GROUP BY t.folder, t.total, t.vocab
ORDER BY t.folder
"""


@register(
    "source_token_entropy",
    oracle=_ENTROPY_ORACLE,
    doc="Shannon token entropy per source folder, plus the entropy "
    "normalized by ln(vocab) — the corpus-diversity diagnostic that "
    "complements unigram_surprisal_score (per-doc) and "
    "vocab_growth_curve (corpus-wide): low normalized entropy flags "
    "a template-dominated or near-duplicate source worth "
    "deduplicating before training. Two chained aggregations on the "
    "same folder key (term counts, then folder totals re-aggregating "
    "the small per-term rollup), entropy terms as fixed-point "
    "BIGINTs.",
    tags=("text", "quality", "training"),
)
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        F.split(F.col("source"), "/").getItem(0).alias("folder"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    )
    g = toks.groupBy("folder", "term").agg(F.count("*").alias("tf"))
    tot = g.groupBy("folder").agg(
        F.sum("tf").alias("total"), F.count("*").alias("vocab")
    )
    terms = g.join(tot, "folder").select(
        "folder",
        F.round(
            (F.col("tf").cast("double") / F.col("total"))
            * F.log(F.col("total").cast("double") / F.col("tf"))
            * F.lit(1e12)
        )
        .cast("long")
        .alias("h_fp"),
    )
    h = terms.groupBy("folder").agg(F.sum("h_fp").alias("h"))
    ent = F.col("h").cast("double") / F.lit(1e12)
    return (
        h.join(tot, "folder")
        .select(
            "folder",
            F.col("total").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.round(ent, 6).alias("entropy"),
            F.when(
                F.col("vocab") > 1,
                F.round(ent / F.log(F.col("vocab").cast("double")), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("normalized_entropy"),
        )
        .orderBy("folder")
    )


# ---------------------------------------------------------------------
# Trending top-k per time bucket (per-group window limit over weeks)
# ---------------------------------------------------------------------

_TRENDING_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', ts) AS week,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         count(*) AS n
  FROM events
  GROUP BY 1, 2
),
ranked AS (
  SELECT week, k_val, n,
         row_number() OVER (PARTITION BY week ORDER BY n DESC, k_val ASC) AS rn
  FROM weekly
)
SELECT strftime(week, '%Y-%m-%d') AS week_start, k_val, CAST(n AS BIGINT) AS n,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 3
ORDER BY week_start, rank
"""


@register(
    "weekly_top_props",
    oracle=_TRENDING_ORACLE,
    doc="Trending top-3 payload values per ISO week: JSON-extract the "
    "props key, count per (week, value), per-group window limit. "
    "Catalyst turns the rn<=3 filter into WindowGroupLimit, so each "
    "shuffle partition keeps 3 rows per week before the final rank "
    "— the 'trending items per period' dashboard shape at 100 TB "
    "without a global sort. JSON parsing stays JVM-side "
    "(get_json_object), never a Python UDF.",
    tags=("events", "window", "json"),
)
def weekly_top_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    weekly = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("week").orderBy(F.desc("n"), F.asc("k_val"))
    return (
        weekly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week_start"),
            "k_val",
            F.col("n").cast("long").alias("n"),
            F.col("rn").cast("long").alias("rank"),
        )
        .orderBy("week_start", "rank")
    )


# ---------------------------------------------------------------------
# Robust outliers: median absolute deviation per event type
# ---------------------------------------------------------------------
#
# Both the median and the MAD use the distinct-value cumulative trick
# (windows run over the small distinct-value domain, never the fact
# rows), so the robust z-score needs no global sort at any scale.

_MAD_ORACLE = """
WITH dist AS (
  SELECT event_type, value, count(*) AS c FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, value, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY value ASC) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM dist
),
med AS (
  SELECT event_type, max(n) AS n,
         min(CASE WHEN cum >= ceil(0.50*n) THEN value END) AS median
  FROM cum GROUP BY event_type
),
devdist AS (
  SELECT d.event_type, abs(d.value - m.median) AS dev, sum(d.c) AS c
  FROM dist d JOIN med m ON d.event_type = m.event_type
  GROUP BY 1, 2
),
devcum AS (
  SELECT event_type, dev, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY dev ASC) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM devdist
),
mad AS (
  SELECT event_type,
         min(CASE WHEN cum >= ceil(0.50*n) THEN dev END) AS mad
  FROM devcum GROUP BY event_type
)
SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
       m.median, d.mad,
       CAST(coalesce(sum(CASE WHEN abs(x.value - m.median) > 3*d.mad
                              THEN x.c END), 0) AS BIGINT) AS n_outliers,
       round(CAST(coalesce(sum(CASE WHEN abs(x.value - m.median) > 3*d.mad
                                    THEN x.c END), 0) AS DOUBLE) / m.n, 6) AS outlier_share
FROM med m
JOIN mad d ON m.event_type = d.event_type
JOIN dist x ON x.event_type = m.event_type
GROUP BY m.event_type, m.n, m.median, d.mad
ORDER BY m.event_type
"""


@register(
    "value_mad_outliers",
    oracle=_MAD_ORACLE,
    doc="Robust outlier detection per event type: median absolute "
    "deviation with a 3-MAD fence — the robust twin of the 3-sigma "
    "z-score scan (value_outlier_events), immune to the outliers it "
    "hunts. Median and MAD both come from the distinct-value "
    "cumulative trick: every window orders only the per-type "
    "distinct values (bounded domain), the fact table is touched by "
    "hash aggregation alone. The MAD threshold comparison re-uses "
    "the collapsed distinct table, so the fence costs one broadcast "
    "join, not a rescan.",
    tags=("events", "percentile", "quality"),
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    dist = ev.groupBy("event_type", "value").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("value"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = dist.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    med = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("value"))
        ).alias("median"),
    )
    devdist = (
        dist.join(F.broadcast(med.select("event_type", "median")), "event_type")
        .groupBy("event_type", F.abs(F.col("value") - F.col("median")).alias("dev"))
        .agg(F.sum("c").alias("c"))
    )
    wdev = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("dev"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    devcum = devdist.select(
        "event_type",
        "dev",
        "c",
        F.sum("c").over(wdev).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    mad = devcum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("dev"))
        ).alias("mad")
    )
    fences = med.join(mad, "event_type")
    out = (
        dist.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "n", "median", "mad")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.abs(F.col("value") - F.col("median")) > 3 * F.col("mad"),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            ).alias("n_out")
        )
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        "median",
        "mad",
        F.col("n_out").cast("long").alias("n_outliers"),
        F.round(F.col("n_out").cast("double") / F.col("n"), 6).alias("outlier_share"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------
# Bounded 2-core peeling over the document graph
# ---------------------------------------------------------------------

_EDGES_SQL = """
  SELECT a.doc_id AS s, a.doc_id + 20 AS t
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 20
  UNION ALL
  SELECT a.doc_id, a.doc_id + 40
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 40
"""


def _two_core_oracle(rounds: int) -> str:
    ctes = []
    prev_e = "edges"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""deg{r} AS (
  SELECT id, count(*) AS deg FROM (
    SELECT s AS id FROM {prev_e} UNION ALL SELECT t AS id FROM {prev_e}
  ) GROUP BY id
),
n{r} AS (SELECT id FROM deg{r} WHERE deg >= 2),
e{r} AS (
  SELECT e.s, e.t FROM {prev_e} e
  JOIN n{r} a ON e.s = a.id JOIN n{r} b ON e.t = b.id
)"""
        )
        prev_e = f"e{r}"
    chain = ",\n".join(ctes)
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, (SELECT count(*) FROM n{r}) AS n_nodes, "
        f"(SELECT count(*) FROM e{r}) AS n_edges"
        for r in range(1, rounds + 1)
    )
    return f"""
WITH edges AS ({_EDGES_SQL}),
{chain}
SELECT CAST(round AS BIGINT) AS round, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges
FROM ({selects}) ORDER BY round
"""


@register(
    "graph_2core_rounds",
    oracle=_two_core_oracle(3),
    doc="Bounded 2-core decomposition: three peeling rounds (drop "
    "degree<2 nodes, restrict edges, repeat), reporting surviving "
    "node/edge counts per round — the graph-densification primitive "
    "behind community pruning and spam-subgraph removal. Each round "
    "is one degree aggregation plus two semi-join passes over the "
    "shrinking edge set; rounds are fixed so the oracle mirrors "
    "them as chained CTEs (full k-core needs data-dependent "
    "iteration counts — at cluster scale you loop until a round "
    "removes nothing, checkpointing every few rounds).",
    tags=("graph", "iterative"),
)
def graph_2core_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    ids = docs.select(F.col("doc_id").alias("_b"))

    def shifted(k: int) -> DataFrame:
        return (
            docs.select(F.col("doc_id").alias("s"), (F.col("doc_id") + k).alias("t"))
            .join(ids, F.col("t") == F.col("_b"))
            .select("s", "t")
        )

    edges = shifted(20).unionByName(shifted(40)).localCheckpoint(eager=True)
    rounds = []
    for r in range(1, 4):
        endpoints = edges.select(F.col("s").alias("id")).unionByName(
            edges.select(F.col("t").alias("id"))
        )
        deg = endpoints.groupBy("id").agg(F.count("*").alias("deg"))
        nodes = deg.filter(F.col("deg") >= 2).select("id").localCheckpoint(eager=True)
        edges = (
            edges.join(nodes.withColumnRenamed("id", "_sa"), F.col("s") == F.col("_sa"))
            .join(nodes.withColumnRenamed("id", "_ta"), F.col("t") == F.col("_ta"))
            .select("s", "t")
            .localCheckpoint(eager=True)
        )
        rounds.append(
            nodes.agg(F.count("*").alias("n_nodes"))
            .crossJoin(edges.agg(F.count("*").alias("n_edges")))
            .select(
                F.lit(r).cast("long").alias("round"),
                F.col("n_nodes").cast("long").alias("n_nodes"),
                F.col("n_edges").cast("long").alias("n_edges"),
            )
        )
    out = rounds[0]
    for r_df in rounds[1:]:
        out = out.unionByName(r_df)
    return out.orderBy("round")


# ---------------------------------------------------------------------
# Streaming ordered funnel under the oracle gate
# ---------------------------------------------------------------------

_FUNNEL_STREAM_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT v.user_id,
       strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM v
JOIN c ON v.user_id = c.user_id
JOIN p ON c.user_id = p.user_id
ORDER BY v.user_id
"""


@register(
    "streamed_funnel_conversions",
    oracle=_FUNNEL_STREAM_ORACLE,
    doc="The applyInPandasWithState ordered-funnel state machine "
    "(streaming/events.funnel_stream: first view -> first click "
    "after it -> first purchase after that, one conversion emitted "
    "per user) run to completion over the events table and "
    "hash-checked against the min-chain ANSI-SQL definition of the "
    "same funnel. Conversions emit on the purchase event, so no "
    "sentinel drain is needed (contrast streamed_session_stats, "
    "whose tails only flush by timeout). Single-file source = one "
    "ordered micro-batch; multi-batch replays tolerate in-order "
    "delivery, which a Kafka source partitioned by user_id "
    "guarantees per key.",
    tags=("streaming", "stateful", "events"),
)
def streamed_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from memories_spark.sources.tables import _restore_timestamps
    from memories_spark.streaming.events import funnel_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="stream_funnel_")
    os.symlink(os.path.abspath(path), os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(path).schema
    stream = _restore_timestamps(
        "events", spark.readStream.schema(schema).parquet(stage)
    )
    conv = funnel_stream(stream)
    qname = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    q = (
        conv.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from memories_spark.streaming import drain_stream

    drain_stream(q)
    return (
        spark.table(qname)
        .select(
            "user_id",
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )
        .orderBy("user_id")
    )
