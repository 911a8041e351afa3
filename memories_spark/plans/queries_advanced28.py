"""Advanced analytics batch 32: mutual nearest neighbors and a
walk-forward seasonal-naive forecast backtest.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_DIM = 64

# ---------------------------------------------------------------------
# Mutual nearest neighbors (reciprocal 1-NN pairs)
# ---------------------------------------------------------------------

_MNN_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         round({cosine_sql('a.embedding', 'b.embedding', _DIM)}, 9) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
),
nn AS (
  SELECT qid, nid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
  FROM pairs QUALIFY rk = 1
)
SELECT a.qid AS id_a, a.nid AS id_b, round(a.sim, 6) AS sim
FROM nn a JOIN nn b ON a.nid = b.qid AND b.nid = a.qid AND a.qid < b.qid
ORDER BY id_a
"""


@register(
    "mutual_nearest_neighbors",
    oracle=_MNN_ORACLE,
    doc="Reciprocal 1-NN pairs: (a, b) where a is b's single nearest "
    "cosine neighbor AND b is a's — the high-precision matching "
    "primitive behind bitext mining, cross-lingual alignment, and "
    "conservative dedup (mutuality filters out hub points that "
    "are 'nearest' to everything, which one-directional kNN "
    "cannot). One ranked pass produces every point's 1-NN; the "
    "mutual check is a self-join of that tiny (corpus-sized, "
    "2-column) table against itself with the reversed key. At "
    "scale the pair stage swaps for LSH-blocked candidates "
    "exactly as knn_label_disagreement describes.",
    tags=("similarity", "dedup"),
)
def mutual_nearest_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    a = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("qid") != F.col("nid")).select(
        "qid", "nid", F.round(cosine_expr("ea", "eb"), 9).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    nn = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("qid", "nid", "sim")
        .cache()
    )
    rev = nn.select(
        F.col("qid").alias("r_qid"), F.col("nid").alias("r_nid")
    )
    return (
        nn.join(
            rev,
            (F.col("nid") == F.col("r_qid")) & (F.col("r_nid") == F.col("qid")),
        )
        .filter(F.col("qid") < F.col("nid"))
        .select(
            F.col("qid").alias("id_a"),
            F.col("nid").alias("id_b"),
            F.round(F.col("sim"), 6).alias("sim"),
        )
        .orderBy("id_a")
    )


# ---------------------------------------------------------------------
# Seasonal-naive walk-forward backtest (predict day d by day d-7)
# ---------------------------------------------------------------------

_BACKTEST_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
joined AS (
  SELECT a.event_type, a.d, a.n AS actual, p.n AS predicted
  FROM daily a JOIN daily p
    ON a.event_type = p.event_type AND p.d = a.d - 7
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days_scored,
       CAST(sum(abs(actual - predicted)) AS BIGINT) AS abs_err_total,
       round(CAST(sum(abs(actual - predicted)) AS DOUBLE) / count(*), 4)
         AS mae,
       round(CAST(sum(abs(actual - predicted)) AS DOUBLE) / sum(actual), 6)
         AS wape
FROM joined
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "seasonal_naive_backtest",
    oracle=_BACKTEST_ORACLE,
    doc="Walk-forward backtest of the seasonal-naive forecaster "
    "(predict each day's per-type count with the SAME WEEKDAY one "
    "week earlier): MAE and WAPE per event type, every error an "
    "exact BIGINT — the benchmark any real demand forecaster must "
    "beat, and with seasonality_dow_index + hourly_acf the third "
    "leg of the seasonality toolkit. The lag join is an equi-join "
    "of the tiny daily rollup against itself shifted by 7 — no "
    "window, no densification needed since only days with both "
    "sides present score (the honest backtest convention).",
    tags=("temporal", "stats"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type",
        (F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d"),
    ).agg(F.count("*").alias("n"))
    p = daily.select(
        F.col("event_type").alias("p_type"),
        (F.col("d") + 7).alias("p_d"),
        F.col("n").alias("predicted"),
    )
    joined = daily.join(
        p,
        (F.col("event_type") == F.col("p_type")) & (F.col("d") == F.col("p_d")),
    ).select("event_type", F.col("n").alias("actual"), "predicted")
    ae = F.abs(F.col("actual") - F.col("predicted"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.sum(ae).alias("abs_err_total"),
            F.sum("actual").alias("act_total"),
        )
        .select(
            "event_type",
            "n_days_scored",
            "abs_err_total",
            F.round(
                F.col("abs_err_total").cast("double") / F.col("n_days_scored"),
                4,
            ).alias("mae"),
            F.round(
                F.col("abs_err_total").cast("double") / F.col("act_total"), 6
            ).alias("wape"),
        )
        .orderBy("event_type")
    )
