"""Advanced analytics batch 36: robust coordinate-wise aggregation of
embeddings (median + trimmed mean per label/dimension) — the
Byzantine-resistant combiner from federated/distributed learning.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_DIMS_OUT = 8  # report the first 8 coordinates per label
_TRIM_PCT = 10

_ROBUST_ORACLE = f"""
WITH expanded AS (
  SELECT label, i.i AS dim,
         CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT) AS v
  FROM embeddings, (SELECT unnest(generate_series(1, {_DIMS_OUT})) AS i) i
),
ranked AS (
  SELECT label, dim, v,
         row_number() OVER (PARTITION BY label, dim ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY label, dim) AS n
  FROM expanded
),
med AS (
  SELECT label, dim,
         CAST(min(CASE WHEN rk * 2 >= n THEN v END) AS BIGINT) AS med_v,
         CAST(max(n) AS BIGINT) AS n
  FROM ranked GROUP BY label, dim
),
trimmed AS (
  SELECT r.label, r.dim,
         CAST(sum(CASE WHEN r.rk > r.n * {_TRIM_PCT} // 100
                        AND r.rk <= r.n - r.n * {_TRIM_PCT} // 100
                       THEN r.v ELSE 0 END) AS BIGINT) AS s,
         CAST(sum(CASE WHEN r.rk > r.n * {_TRIM_PCT} // 100
                        AND r.rk <= r.n - r.n * {_TRIM_PCT} // 100
                       THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM ranked r GROUP BY r.label, r.dim
)
SELECT CAST(med.label AS BIGINT) AS label, CAST(med.dim AS BIGINT) AS dim,
       med.n AS n_members,
       round(CAST(med.med_v AS DOUBLE) / 1e6, 6) AS coord_median,
       round(CAST(t.s AS DOUBLE) / t.m / 1e6, 6) AS trimmed_mean
FROM med JOIN trimmed t ON med.label = t.label AND med.dim = t.dim
ORDER BY label, dim
"""


@register(
    "robust_coordinate_aggregate",
    oracle=_ROBUST_ORACLE,
    doc="Robust aggregation of embeddings per label: the coordinate- "
    "wise MEDIAN and the 10%-trimmed mean of each of the first 8 "
    "dimensions — the Byzantine-resistant combiners (coordinate "
    "median, trimmed mean) that replace plain averaging when some "
    "contributors are corrupted or adversarial (federated "
    "learning's standard defenses, equally the right centroid "
    "for k-means over noisy data — compare kmeans_refine_step's "
    "exact means). Values freeze to 1e-6 fixed point at explode "
    "time; median is nearest-rank (rk*2 >= n) and the trim "
    "bounds are integer arithmetic, so every output is an exact "
    "function of the input multiset. Partitions are (label, dim) "
    "— thousands of small groups, embarrassingly parallel.",
    tags=("similarity", "stats", "training"),
)
def robust_coordinate_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    expanded = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .filter(F.col("pos") < _DIMS_OUT)
        .select(
            "label",
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("x").cast("double") * F.lit(1e6))
            .cast("long")
            .alias("v"),
        )
    )
    w = Window.partitionBy("label", "dim").orderBy("v")
    ranked = expanded.select(
        "label",
        "dim",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count("*")
        .over(Window.partitionBy("label", "dim"))
        .alias("n"),
    )
    lo = F.expr(f"n * {_TRIM_PCT} DIV 100")
    keep = (F.col("rk") > lo) & (F.col("rk") <= F.col("n") - lo)
    agg = ranked.groupBy("label", "dim").agg(
        F.max("n").alias("n_members"),
        F.min(F.when(F.col("rk") * 2 >= F.col("n"), F.col("v"))).alias(
            "med_v"
        ),
        F.sum(F.when(keep, F.col("v")).otherwise(0)).alias("s"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("m"),
    )
    return (
        agg.select(
            F.col("label").cast("long").alias("label"),
            "dim",
            "n_members",
            F.round(F.col("med_v").cast("double") / F.lit(1e6), 6).alias(
                "coord_median"
            ),
            F.round(
                F.col("s").cast("double") / F.col("m") / F.lit(1e6), 6
            ).alias("trimmed_mean"),
        )
        .orderBy("label", "dim")
    )
