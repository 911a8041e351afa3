"""Advanced analytics batch 22: rank-biased overlap between two
rankings, per-user maximum drawdown, and train/val n-gram leakage.

Determinism contract as per the registry module docstring. RBO uses
p = 1/2 so the depth weights are dyadic; every term freezes to fixed
point before summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import bounded_seq, tokens_sql, tokens_expr
from memories_spark.functions.topk import ranked_topk
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Rank-biased overlap: revenue-ranked vs quantity-ranked parts
# ---------------------------------------------------------------------

_RBO_DEPTH = 10

_RBO_ORACLE = f"""
WITH agg AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
),
ra AS (
  SELECT l_partkey,
         row_number() OVER (ORDER BY rev_cents DESC, l_partkey ASC) AS r
  FROM agg QUALIFY r <= {_RBO_DEPTH}
),
rb AS (
  SELECT l_partkey,
         row_number() OVER (ORDER BY qty DESC, l_partkey ASC) AS r
  FROM agg QUALIFY r <= {_RBO_DEPTH}
),
pairs AS (
  SELECT ra.l_partkey, ra.r AS r_a, rb.r AS r_b
  FROM ra JOIN rb ON ra.l_partkey = rb.l_partkey
),
depths AS (SELECT unnest(generate_series(1, {_RBO_DEPTH})) AS d),
ov AS (
  SELECT d.d,
         CAST(count(p.l_partkey) AS BIGINT) AS n_common
  FROM depths d LEFT JOIN pairs p ON p.r_a <= d.d AND p.r_b <= d.d
  GROUP BY d.d
),
terms AS (
  SELECT d, n_common,
         CAST(round(power(0.5, d - 1) * n_common / d * 1e12) AS BIGINT)
           AS t_fp
  FROM ov
)
SELECT CAST(sum(CASE WHEN d = {_RBO_DEPTH} THEN n_common ELSE 0 END)
            AS BIGINT) AS overlap_at_10,
       round(0.5 * CAST(sum(t_fp) AS DOUBLE) / 1e12, 6) AS rbo
FROM terms
"""


@register(
    "rbo_rank_agreement",
    oracle=_RBO_ORACLE,
    doc="Rank-biased overlap (Webber et al.) between two top-10 "
    "rankings of parts — by total revenue vs by total quantity — "
    "the top-weighted agreement metric for comparing rankers "
    "(truncated at depth 10, p = 1/2 so early agreement dominates "
    "and the depth weights are dyadic). Both rankings come from "
    "ONE shared aggregation pass; per-depth overlaps are a 10-row "
    "broadcast join over the joined rank pairs; each term "
    "(1/2)^(d-1) * |overlap_d| / d freezes to fixed point before "
    "the sum. The same query shape scores BM25-vs-vector ranker "
    "agreement in retrieval evaluation.",
    tags=("stats", "retrieval"),
)
def rbo_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    agg = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100.0).cast("long")).alias(
            "rev_cents"
        ),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
    )
    ra = ranked_topk(
        agg, [F.col("rev_cents").desc(), F.col("l_partkey").asc()],
        _RBO_DEPTH, rank_col="r_a",
    ).select("l_partkey", "r_a")
    rb = ranked_topk(
        agg, [F.col("qty").desc(), F.col("l_partkey").asc()],
        _RBO_DEPTH, rank_col="r_b",
    ).select("l_partkey", "r_b")
    pairs = ra.join(rb, "l_partkey")
    depths = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").cast("long").alias("d")
    )
    ov = (
        depths.join(
            pairs,
            (pairs["r_a"] <= F.col("d")) & (pairs["r_b"] <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count("l_partkey").alias("n_common"))
    )
    terms = ov.select(
        "d",
        "n_common",
        F.round(
            F.pow(F.lit(0.5), F.col("d") - 1)
            * F.col("n_common")
            / F.col("d")
            * F.lit(1e12)
        )
        .cast("long")
        .alias("t_fp"),
    )
    return terms.agg(
        F.sum(
            F.when(F.col("d") == _RBO_DEPTH, F.col("n_common")).otherwise(0)
        )
        .cast("long")
        .alias("overlap_at_10"),
        F.round(
            F.lit(0.5) * F.sum("t_fp").cast("double") / F.lit(1e12), 6
        ).alias("rbo"),
    )


# ---------------------------------------------------------------------
# Per-user maximum drawdown of the cumulative value series
# ---------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts,
         sum(CAST(round(value * 100.0) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM events
),
dd AS (
  SELECT user_id, event_id,
         max(cum) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum AS draw
  FROM seq
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(max(draw) AS DOUBLE) / 100.0, 2) AS max_drawdown
FROM dd
GROUP BY user_id
HAVING max(draw) > 0
ORDER BY user_id
"""


@register(
    "user_value_drawdown",
    oracle=_DRAWDOWN_ORACLE,
    doc="Maximum drawdown of each user's cumulative value series "
    "(largest peak-to-trough drop, the finance risk metric applied "
    "to engagement value): running cumulative sum, running max of "
    "that sum, and the max of their difference — THREE windows "
    "sharing ONE user_id shuffle and one (ts, event_id) sort, all "
    "in exact cents. Note the metric is only nonzero when values "
    "can go negative or the 'portfolio' dips — users whose values "
    "are all positive never draw down, and the HAVING filter "
    "keeps the report to users that did.",
    tags=("temporal", "stats"),
)
def user_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seq = ev.select(
        "user_id",
        F.sum(F.round(F.col("value") * 100.0).cast("long"))
        .over(w)
        .alias("cum"),
        F.col("ts"),
        F.col("event_id"),
    )
    dd = seq.select(
        "user_id", (F.max("cum").over(w) - F.col("cum")).alias("draw")
    )
    return (
        dd.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("draw").alias("mx"))
        .filter(F.col("mx") > 0)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("mx").cast("double") / 100.0, 2).alias(
                "max_drawdown"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------
# Train/val n-gram leakage audit
# ---------------------------------------------------------------------

_LEAK_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, {tokens_sql('text')} AS toks,
         CASE WHEN CAST(concat('0x',
                substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2))
                AS INTEGER) < 204
              THEN 'train' ELSE 'heldout' END AS split
  FROM documents
),
grams AS (
  SELECT DISTINCT split,
         unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                               i -> array_to_string(toks[i:i+2], ' '))) AS g
  FROM assigned
),
train_g AS (SELECT g FROM grams WHERE split = 'train'),
held_g AS (SELECT g FROM grams WHERE split = 'heldout')
SELECT CAST((SELECT count(*) FROM held_g) AS BIGINT) AS n_heldout_grams,
       CAST((SELECT count(*) FROM held_g
             WHERE g IN (SELECT g FROM train_g)) AS BIGINT) AS n_leaked,
       round(CAST((SELECT count(*) FROM held_g
                   WHERE g IN (SELECT g FROM train_g)) AS DOUBLE)
             / (SELECT count(*) FROM held_g), 6) AS leak_share
"""


@register(
    "split_ngram_leakage",
    oracle=_LEAK_ORACLE,
    doc="Train/held-out contamination audit at the n-gram level: the "
    "fraction of the held-out split's distinct 3-word shingles "
    "that also appear in the train split — the leakage number an "
    "eval harness must report before claiming held-out metrics "
    "(decontaminate_ngram_overlap screens against an EXTERNAL "
    "benchmark; this screens the split boundary itself). Split "
    "assignment is the dataset_split_assignment hash; the overlap "
    "is a LEFT SEMI join on the 3-gram key between two distinct- "
    "gram sets. A high share here means duplicated/boilerplate "
    "text crosses the split and the held-out loss is optimistic.",
    tags=("training", "quality"),
)
def split_ngram_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            1,
            2,
        ),
        16,
        10,
    ).cast("int")
    toked = docs.select(
        F.when(bucket < 204, "train").otherwise("heldout").alias("split"),
        tokens_expr("text").alias("toks"),
    )
    idx = bounded_seq(F.size("toks") - 2)
    grams = toked.select(
        "split",
        F.explode(
            F.array_distinct(
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice("toks", i, 3)))
            )
        ).alias("g"),
    ).distinct()
    train_g = grams.filter(F.col("split") == "train").select("g")
    held_g = grams.filter(F.col("split") == "heldout").select("g")
    leaked = held_g.join(train_g, "g", "left_semi")
    return (
        held_g.agg(F.count("*").alias("n_heldout_grams"))
        .crossJoin(leaked.agg(F.count("*").alias("n_leaked")))
        .select(
            "n_heldout_grams",
            "n_leaked",
            F.round(
                F.col("n_leaked").cast("double") / F.col("n_heldout_grams"), 6
            ).alias("leak_share"),
        )
    )
