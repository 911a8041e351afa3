"""Training-data pipeline queries, batch 2: TF-IDF keyword
extraction, benchmark decontamination, repetition filtering,
winsorized statistics and hopping-window rollups.

These extend the reference's text/maintenance surface (SURVEY §2.7,
usage_tracker analytics) with the operations a web-scale pretraining
pipeline runs daily. Every query keeps its shuffles explicit and its
doubles fixed-point so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import (
    bounded_seq,
    tokens_sql,
    tokens_expr,
    word_shingles_expr,
)
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_TOKS = tokens_sql("text")

# ---------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toked)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
) WHERE rn <= 3
ORDER BY doc_id, rank
"""


@register(
    "tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    doc="Top-3 TF-IDF keywords per document. Plan: one explode+groupBy "
    "builds the (doc, term, tf) postings; document frequency is a "
    "second aggregation of that table (|vocabulary| rows) joined "
    "back as a broadcast — term dictionaries are small even at "
    "100 TB corpus scale — and the per-doc top-3 window shuffles "
    "once on doc_id. Scores are rounded before ranking so the "
    "DuckDB twin ranks the identical doubles; ties break term ASC.",
    tags=("text", "tfidf", "training"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df.withColumnRenamed("term", "_t")), F.col("term") == F.col("_t"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf", F.col("rank").cast("long").alias("rank"))
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------
# Benchmark decontamination: 3-gram overlap train vs test split
# ---------------------------------------------------------------------

_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(toks) - 2, 0)), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))"
)

_DECON_ORACLE = f"""
WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle FROM toked
),
pairs AS (
  SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM sh tr JOIN sh te ON tr.shingle = te.shingle
  WHERE tr.doc_id % 97 != 0 AND te.doc_id % 97 = 0
  GROUP BY tr.doc_id, te.doc_id
),
test_sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
  FROM sh WHERE doc_id % 97 = 0 GROUP BY doc_id
)
SELECT p.train_doc, p.test_doc, p.n_shared,
       round(CAST(p.n_shared AS DOUBLE) / t.n_sh, 6) AS overlap_frac
FROM pairs p JOIN test_sizes t ON p.test_doc = t.doc_id
WHERE p.n_shared >= 2
ORDER BY p.n_shared DESC, p.train_doc ASC, p.test_doc ASC
LIMIT 100
"""


@register(
    "decontaminate_ngram_overlap",
    oracle=_DECON_ORACLE,
    doc="Benchmark decontamination: distinct word 3-gram overlap "
    "between the training split and a deterministic held-out split "
    "(doc_id % 97 == 0 plays the benchmark). The held-out side's "
    "exploded shingles are BROADCAST — eval sets are tiny relative "
    "to a 100 TB corpus, so the contamination check is a map-side "
    "join over one training-corpus scan, no shuffle of the big "
    "side. Pairs sharing >=2 shingles are reported with the "
    "fraction of the test doc covered (the usual removal "
    "threshold feed).",
    tags=("training", "dedup", "decontamination"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    sh = docs.select(
        "doc_id", F.explode(word_shingles_expr("text", 3)).alias("shingle")
    )
    train = sh.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    test = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("test_doc"), F.col("shingle").alias("t_shingle")
    )
    test_sizes = test.groupBy("test_doc").agg(F.count("*").alias("n_sh"))
    pairs = (
        train.join(F.broadcast(test), F.col("shingle") == F.col("t_shingle"))
        .groupBy("train_doc", "test_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return (
        pairs.join(F.broadcast(test_sizes), "test_doc")
        .select(
            "train_doc",
            "test_doc",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(F.col("n_shared").cast("double") / F.col("n_sh"), 6).alias(
                "overlap_frac"
            ),
        )
        .orderBy(F.desc("n_shared"), F.asc("train_doc"), F.asc("test_doc"))
        .limit(100)
    )


# ---------------------------------------------------------------------
# Repetition / boilerplate profile (Gopher repetition rules)
# ---------------------------------------------------------------------

_BIGRAMS_SQL = (
    "list_transform(generate_series(1, greatest(len(toks) - 1, 0)), "
    "i -> array_to_string(list_slice(toks, i, i + 1), ' '))"
)

_REPETITION_ORACLE = f"""
WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok_stats AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
           AS dup_token_frac
  FROM toked WHERE len(toks) >= 2
),
bg AS (
  SELECT doc_id, unnest({_BIGRAMS_SQL}) AS gram FROM toked
),
bg_counts AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
  FROM bg GROUP BY doc_id, gram
),
bg_top AS (
  SELECT doc_id, gram AS top_bigram, c,
         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS total_bg,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
  FROM bg_counts
)
SELECT t.doc_id, t.n_tokens, t.dup_token_frac,
       b.top_bigram,
       round(CAST(b.c AS DOUBLE) / b.total_bg, 6) AS top_bigram_share
FROM tok_stats t JOIN bg_top b ON t.doc_id = b.doc_id AND b.rn = 1
ORDER BY t.doc_id
"""


@register(
    "repetition_profile",
    oracle=_REPETITION_ORACLE,
    doc="Gopher-style repetition metrics per document: duplicate-token "
    "fraction (1 - distinct/total, pure array exprs — no shuffle) "
    "and the most frequent bigram's share of all bigrams (explode + "
    "two-stage agg + per-doc window, shuffling only (doc_id, gram) "
    "pairs). High values on either flag boilerplate/spam for the "
    "quality filter; joined on doc_id at the end.",
    tags=("training", "quality", "text"),
)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", tokens_expr("text").alias("toks"))
    n_tokens = F.size("toks")
    tok_stats = toked.filter(n_tokens >= 2).select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n_tokens, 6
        ).alias("dup_token_frac"),
    )
    idx = bounded_seq(F.size("toks") - 1)
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("toks", i, 2)))
    bg_counts = (
        toked.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    wt = Window.partitionBy("doc_id")
    wr = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
    bg_top = (
        bg_counts.select(
            "doc_id",
            F.col("gram").alias("top_bigram"),
            "c",
            F.sum("c").over(wt).cast("long").alias("total_bg"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        tok_stats.join(bg_top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            "top_bigram",
            F.round(F.col("c").cast("double") / F.col("total_bg"), 6).alias(
                "top_bigram_share"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# Winsorized event statistics (robust means)
# ---------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN value END) AS lo,
         max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(CAST(round(least(greatest(e.value, b.lo), b.hi) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 / count(*), 6) AS winsorized_mean,
       round(max(b.lo), 6) AS lo,
       round(max(b.hi), 6) AS hi
FROM events e JOIN bounds b ON e.event_type = b.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


@register(
    "winsorized_event_stats",
    oracle=_WINSOR_ORACLE,
    doc="Robust per-type mean with values winsorized to the "
    "nearest-rank [p05, p95] band — the outlier-proof form of the "
    "reference's latency /metrics aggregates. The bounds table is "
    "one window pass (shuffle on event_type) collapsed to "
    "|event_types| rows and broadcast back onto the fact scan, so "
    "clamping + the exact fixed-point mean costs one more "
    "aggregation, never a re-sort.",
    tags=("agg", "events", "percentile"),
)
def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("value"))
    )
    bounds = ranked.groupBy("event_type").agg(
        pick(0.05).alias("lo"), pick(0.95).alias("hi")
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    micros = F.round(clamped * 1e6).cast("long")
    return (
        ev.join(
            F.broadcast(bounds.withColumnRenamed("event_type", "_et")),
            F.col("event_type") == F.col("_et"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(micros).alias("_m"),
            F.round(F.max("lo"), 6).alias("lo"),
            F.round(F.max("hi"), 6).alias("hi"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("_m").cast("double") / 1e6 / F.col("n"), 6).alias(
                "winsorized_mean"
            ),
            "lo",
            "hi",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Hopping (sliding) window rollup — batch twin of the streaming shape
# ---------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT make_timestamp(((CAST(floor(epoch(ts) / 300) AS BIGINT) - k.k) * 300) * 1000000) AS w_start,
         event_type, value
  FROM events, (SELECT unnest([0, 1]) AS k) k
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0, 2) AS total_value
FROM expanded
GROUP BY w_start, event_type
ORDER BY window_start, event_type
"""


@register(
    "sliding_event_counts",
    oracle=_SLIDING_ORACLE,
    doc="Hopping-window rollup (10-minute windows sliding every 5): "
    "each event lands in exactly two windows via Spark's built-in "
    "window() expansion — the batch twin of the Structured "
    "Streaming sliding aggregation in streaming/events.py. One "
    "shuffle on (window, event_type); the oracle replicates the "
    "epoch-aligned window assignment arithmetically.",
    tags=("window", "events", "streaming-twin"),
)
def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    win = F.window("ts", "10 minutes", "5 minutes")
    cents = F.round(F.col("value") * 100.0).cast("long")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("_c"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            F.round(F.col("_c").cast("double") / 100.0, 2).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )
