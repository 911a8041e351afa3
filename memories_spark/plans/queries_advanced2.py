"""Advanced analytics batch 6: language-model quality scoring,
weighted sampling, correlated-subquery decorrelation, per-source
harmonic centrality, and stateful streaming sessionization under the
oracle gate.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import fixed_point_sql, hex_frac_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Unigram-LM surprisal: the perplexity-proxy quality filter
# ---------------------------------------------------------------------

_SURPRISAL_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dict AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
tot AS (SELECT sum(tf) AS n FROM dict),
scored AS (
  SELECT t.doc_id,
         CAST(round(ln(CAST(n AS DOUBLE)/tf) * 1e9) AS BIGINT) AS s_fp
  FROM toks t JOIN dict d ON t.term = d.term CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(s_fp) AS DOUBLE)/count(*)/1e9, 6) AS avg_surprisal
FROM scored GROUP BY doc_id
ORDER BY avg_surprisal DESC, doc_id ASC
LIMIT 25
"""


@register(
    "unigram_surprisal_score",
    oracle=_SURPRISAL_ORACLE,
    doc="Perplexity-proxy quality scoring: train a unigram LM on the "
    "corpus itself (term frequency / total tokens), score each "
    "document by mean token surprisal -ln p(t), surface the 25 "
    "most surprising documents — the cheap stand-in for KenLM "
    "perplexity filtering in training-data pipelines. One token "
    "explode + one groupBy builds the LM; the model flows back as a "
    "broadcast dictionary so scoring is a map-side join; per-doc "
    "surprisal sums are fixed-point BIGINTs. At 100 TB the "
    "dictionary (vocab-sized, not corpus-sized) is the only state "
    "that must fit in executor memory.",
    tags=("text", "quality", "training"),
)
def unigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    dict_df = toks.groupBy("term").agg(F.count("*").alias("tf"))
    tot = dict_df.agg(F.sum("tf").alias("n"))
    scored = (
        toks.join(F.broadcast(dict_df), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("n").cast("double") / F.col("tf")) * F.lit(1e9))
            .cast("long")
            .alias("s_fp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("s_fp").alias("s"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("s").cast("double") / F.col("n_tokens") / F.lit(1e9), 6).alias(
                "avg_surprisal"
            ),
        )
        .orderBy(F.desc("avg_surprisal"), F.asc("doc_id"))
        .limit(25)
    )


# ---------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------
#
# Each document draws a deterministic uniform u from its md5 digest;
# the exponential key -ln(u)/w (w = n_chars) makes the k smallest
# keys an exact weight-proportional sample without replacement — the
# distributed-sampling primitive (one scan + top-k, no global sort).

_ARES_U = hex_frac_sql("md5('ares:' || CAST(doc_id AS VARCHAR))")

_ARES_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(round((-ln({_ARES_U})) / n_chars * 1e15) AS BIGINT) AS key_fp
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(key_fp AS DOUBLE)/1e15, 9) AS sample_key
FROM keyed
ORDER BY key_fp ASC, doc_id ASC
LIMIT 20
"""


@register(
    "weighted_sample_ares",
    oracle=_ARES_ORACLE,
    doc="Weighted reservoir sample (Efraimidis-Spirakis A-Res): "
    "deterministic uniform u from a seeded md5, exponential key "
    "-ln(u)/weight with weight = n_chars, keep the 20 smallest keys "
    "— an exact length-proportional sample without replacement, "
    "reproducible run-over-run. The plan is scan + "
    "TakeOrderedAndProject: each partition keeps its local top-20, "
    "only k rows per partition reach the driver-side merge — no "
    "shuffle, no global sort, the only sane way to sample 100 TB "
    "by weight. Complements stratified_sample (per-stratum rates) "
    "and mixture_weighted_sample (budget allocation).",
    tags=("sampling", "training"),
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    u = F.expr(hex_frac_sql("md5('ares:' || CAST(doc_id AS STRING))"))
    key_fp = F.round(-F.log(u) / F.col("n_chars") * F.lit(1e15)).cast("long")
    return (
        docs.select("doc_id", "n_chars", key_fp.alias("key_fp"))
        .orderBy(F.asc("key_fp"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.round(F.col("key_fp").cast("double") / F.lit(1e15), 9).alias("sample_key"),
        )
    )


# ---------------------------------------------------------------------
# Correlated scalar subquery, decorrelated
# ---------------------------------------------------------------------

_DEVIATION_ORACLE = f"""
WITH scored AS (
  SELECT o_orderkey, o_custkey,
         {fixed_point_sql('o_totalprice', 2)} AS price_c,
         (SELECT CAST(sum({fixed_point_sql('o2.o_totalprice', 2)}) AS DOUBLE)/count(*)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS avg_c
  FROM orders o
)
SELECT o_orderkey, o_custkey,
       round(CAST(price_c AS DOUBLE)/100.0, 2) AS order_value,
       round(avg_c/100.0, 6) AS customer_avg,
       round(CAST(price_c AS DOUBLE)/avg_c, 6) AS ratio
FROM scored
WHERE CAST(price_c AS DOUBLE)/avg_c >= 1.5
ORDER BY o_orderkey
"""


@register(
    "correlated_order_deviation",
    oracle=_DEVIATION_ORACLE,
    doc="Orders that exceed 1.5x their customer's average order "
    "value. The oracle states the query as a CORRELATED scalar "
    "subquery (per-row re-aggregation); the Spark plan is the "
    "decorrelated rewrite — one groupBy on o_custkey plus one "
    "equi-join back to the fact — turning O(orders x customer-"
    "orders) nested evaluation into two shuffles on the same key "
    "(AQE coalesces them). The canonical optimizer transformation, "
    "expressed manually so the plan shape is pinned.",
    tags=("join", "agg", "decorrelation"),
)
def correlated_order_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    price_c = F.round(F.col("o_totalprice") * 100.0).cast("long")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(price_c).alias("s"), F.count("*").alias("cnt")
    ).select(
        F.col("o_custkey").alias("_ck"),
        (F.col("s").cast("double") / F.col("cnt")).alias("avg_c"),
    )
    scored = orders.select(
        "o_orderkey", "o_custkey", price_c.alias("price_c")
    ).join(cust, F.col("o_custkey") == F.col("_ck"))
    ratio = F.col("price_c").cast("double") / F.col("avg_c")
    return (
        scored.filter(ratio >= 1.5)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("price_c").cast("double") / 100.0, 2).alias("order_value"),
            F.round(F.col("avg_c") / 100.0, 6).alias("customer_avg"),
            F.round(ratio, 6).alias("ratio"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------
# Harmonic centrality on the document graph (bounded 4-hop)
# ---------------------------------------------------------------------

_EDGES_SQL = """
  SELECT a.doc_id AS s, a.doc_id + 20 AS t
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 20
  UNION ALL
  SELECT a.doc_id, a.doc_id + 40
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 40
"""


def _harmonic_oracle(hops: int) -> str:
    steps = []
    prev = "d0"
    for i in range(1, hops + 1):
        steps.append(
            f"""d{i} AS (
  SELECT src, id, min(dist) AS dist FROM (
    SELECT src, id, dist FROM {prev}
    UNION ALL
    SELECT d.src, adj.b AS id, d.dist + 1 AS dist
    FROM {prev} d JOIN adj ON d.id = adj.a
  ) GROUP BY src, id
)"""
        )
        prev = f"d{i}"
    chain = ",\n".join(steps)
    return f"""
WITH edges AS ({_EDGES_SQL}),
adj AS (SELECT s AS a, t AS b FROM edges UNION SELECT t, s FROM edges),
nodes AS (SELECT DISTINCT a FROM adj),
d0 AS (SELECT a AS src, a AS id, 0 AS dist FROM nodes),
{chain}
SELECT src AS doc_id, CAST(count(*) - 1 AS BIGINT) AS n_reachable,
       round(CAST(sum(CASE WHEN dist > 0
                           THEN CAST(round(1e12/dist) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)/1e12, 6) AS harmonic
FROM {prev} GROUP BY src
ORDER BY harmonic DESC, doc_id ASC
LIMIT 20
"""


@register(
    "harmonic_centrality",
    oracle=_harmonic_oracle(4),
    doc="Harmonic centrality sum(1/dist) within a 4-hop horizon, "
    "all sources at once: the per-pair BFS frontier is keyed "
    "(src, id) so every round is one join + one min-aggregation "
    "shuffle — 4 fixed Pregel rounds, mirrored by the oracle as "
    "chained CTEs (no recursive CTE: bidirectional edges cycle). "
    "Bounded-horizon centrality is the scale-honest variant: exact "
    "closeness needs full APSP, while the h-hop frontier grows "
    "as O(nodes x avg-degree^h) and the horizon is the knob. "
    "Builds on the bfs_distance_histogram machinery (single "
    "frontier) by widening the key.",
    tags=("graph", "iterative"),
)
def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        edges.select(F.col("s").alias("a"), F.col("t").alias("b"))
        .unionByName(edges.select(F.col("t").alias("a"), F.col("s").alias("b")))
        .dropDuplicates(["a", "b"])
        .cache()
    )
    dist = adj.select(F.col("a").alias("src")).distinct().select(
        "src", F.col("src").alias("id"), F.lit(0).cast("long").alias("dist")
    )
    for i in range(4):
        if i > 0:
            dist = dist.localCheckpoint(eager=True)
        stepped = (
            dist.alias("d")
            .join(adj.alias("j"), F.col("d.id") == F.col("j.a"))
            .select("d.src", F.col("j.b").alias("id"), (F.col("d.dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(stepped)
            .groupBy("src", "id")
            .agg(F.min("dist").alias("dist"))
        )
    out = (
        dist.groupBy("src")
        .agg(
            (F.count("*") - 1).cast("long").alias("n_reachable"),
            F.sum(
                F.when(
                    F.col("dist") > 0,
                    F.round(F.lit(1e12) / F.col("dist")).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("h_fp"),
        )
        .select(
            F.col("src").alias("doc_id"),
            "n_reachable",
            F.round(F.col("h_fp").cast("double") / F.lit(1e12), 6).alias("harmonic"),
        )
        .orderBy(F.desc("harmonic"), F.asc("doc_id"))
        .limit(20)
    )
    return out


# ---------------------------------------------------------------------
# Streaming sessionization under the oracle gate
# ---------------------------------------------------------------------

_STREAM_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) - epoch_us(prev_ts)) > 1800000000
                 THEN 1 ELSE 0 END AS is_break
  FROM ordered
),
sessions AS (
  SELECT *, sum(is_break) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register(
    "streamed_session_stats",
    oracle=_STREAM_SESSION_ORACLE,
    doc="The applyInPandasWithState gap-sessionization operator "
    "(streaming/events.sessionize_stream: O(active users) state, "
    "event-time timeouts) run to completion over the events table "
    "and hash-checked against the batch lag+cumsum ANSI-SQL "
    "definition — custom stateful streaming under the oracle gate, "
    "not just stream-equals-batch. Tail sessions are flushed by two "
    "far-future sentinel files: the first advances the watermark "
    "past every open session's timeout, the second triggers the "
    "timeout round (watermarks take effect one micro-batch later); "
    "sentinel rows are filtered from the output. This is exactly "
    "how a production backfill drains session state: replay, then "
    "advance the clock.",
    tags=("streaming", "stateful", "events"),
)
def streamed_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from memories_spark.sources.tables import _restore_timestamps
    from memories_spark.streaming.events import sessionize_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="stream_sess_")
    os.symlink(os.path.abspath(path), os.path.join(stage, "events.parquet"))

    # Sentinels: match the raw file schema (pyarrow converts the
    # datetime to whatever timestamp unit the file declares). Both are
    # far past every real event; the second is a day later so the
    # watermark set after the first strictly exceeds every timeout
    # when the second batch runs.
    import datetime as _dt

    raw_schema = pq.read_schema(path)
    for i, fname in enumerate(["zz_sentinel1.parquet", "zz_sentinel2.parquet"]):
        cols: dict[str, list] = {
            "event_id": [10**12 + i],
            "ts": [_dt.datetime(2100, 1, 1 + i, 0, 0, 0)],
            "user_id": [-1],
            "event_type": ["sentinel"],
            "value": [0.0],
            "props": ["{}"],
        }
        tbl = pa.table(
            {f.name: pa.array(cols[f.name], type=f.type) for f in raw_schema}
        )
        fpath = os.path.join(stage, fname)
        pq.write_table(tbl, fpath)
        os.utime(fpath, (time.time() + 10 * (i + 1), time.time() + 10 * (i + 1)))

    schema = spark.read.parquet(path).schema
    stream = _restore_timestamps(
        "events",
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage),
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    qname = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from memories_spark.streaming import drain_stream

    drain_stream(q)
    return (
        spark.table(qname)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id", "session_start")
    )
