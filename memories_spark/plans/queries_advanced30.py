"""Advanced analytics batch 34: population stability index (PSI)
drift monitoring between two corpus halves.

Determinism contract as per the registry module docstring: Laplace-
smoothed shares are exact rationals and each PSI term freezes to
fixed point before summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_NBUCK = 8  # log2 length buckets clamped to [0, 7]

_PSI_ORACLE = f"""
WITH halves AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS half,
         least(CAST(floor(ln(greatest(n_chars, 1)) / ln(2.0) / 1.5)
                    AS BIGINT), {_NBUCK - 1}) AS bucket
  FROM documents
),
counts AS (
  SELECT b.bucket,
         CAST(sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS r,
         CAST(sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM (SELECT unnest(generate_series(0, {_NBUCK - 1})) AS bucket) b
  LEFT JOIN halves h ON h.bucket = b.bucket
  GROUP BY b.bucket
),
tot AS (
  SELECT CAST(sum(r) AS BIGINT) AS nr, CAST(sum(c) AS BIGINT) AS nc
  FROM counts
),
terms AS (
  SELECT counts.bucket, r, c,
         CAST(round(
           (CAST(r + 1 AS DOUBLE) / (nr + {_NBUCK})
            - CAST(c + 1 AS DOUBLE) / (nc + {_NBUCK}))
           * ln((CAST(r + 1 AS DOUBLE) / (nr + {_NBUCK}))
                / (CAST(c + 1 AS DOUBLE) / (nc + {_NBUCK})))
           * 1e12) AS BIGINT) AS t_fp
  FROM counts, tot
)
SELECT CAST(bucket AS BIGINT) AS bucket, r AS ref_count, c AS cur_count,
       round(CAST(t_fp AS DOUBLE) / 1e12, 8) AS psi_term,
       round(CAST(sum(t_fp) OVER () AS DOUBLE) / 1e12, 6) AS psi_total
FROM terms
ORDER BY bucket
"""


@register(
    "psi_drift_audit",
    oracle=_PSI_ORACLE,
    doc="Population-stability-index drift monitor: the document-length "
    "distribution (8 log-scale buckets) of the even-id half ('the "
    "reference snapshot') vs the odd-id half ('current'), scored "
    "with Laplace-smoothed PSI = sum (p-q)*ln(p/q) — THE "
    "production ML monitoring metric (PSI < 0.1 stable, > 0.25 "
    "investigate), reported per bucket so the drifting bucket is "
    "visible, with the total on every row. Smoothing (+1 per "
    "bucket) keeps empty buckets finite and the shares exact "
    "rationals; each term freezes to fixed point so the total is "
    "order-independent. One conditional groupBy over the corpus, "
    "then 8-row algebra.",
    tags=("ops", "quality", "stats"),
)
def psi_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.least(
        F.floor(
            F.log(F.greatest(F.col("n_chars"), F.lit(1))) / F.log(F.lit(2.0)) / 1.5
        ).cast("long"),
        F.lit(_NBUCK - 1),
    )
    halves = docs.select(
        F.when(F.col("doc_id") % 2 == 0, "ref").otherwise("cur").alias("half"),
        bucket.alias("bucket"),
    )
    spine = spark.range(0, _NBUCK).select(F.col("id").cast("long").alias("bucket"))
    counts = (
        spine.join(halves, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "ref", 1).otherwise(0)).alias("r"),
            F.sum(F.when(F.col("half") == "cur", 1).otherwise(0)).alias("c"),
        )
    )
    tot = counts.agg(F.sum("r").alias("nr"), F.sum("c").alias("nc"))
    p = (F.col("r") + 1).cast("double") / (F.col("nr") + _NBUCK)
    qq = (F.col("c") + 1).cast("double") / (F.col("nc") + _NBUCK)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "r",
        "c",
        F.round((p - qq) * F.log(p / qq) * F.lit(1e12)).cast("long").alias("t_fp"),
    )
    from pyspark.sql import Window

    total = F.sum("t_fp").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return terms.select(
        "bucket",
        F.col("r").alias("ref_count"),
        F.col("c").alias("cur_count"),
        F.round(F.col("t_fp").cast("double") / F.lit(1e12), 8).alias("psi_term"),
        F.round(total.cast("double") / F.lit(1e12), 6).alias("psi_total"),
    ).orderBy("bucket")
