"""Advanced analytics batch 33: sampled-quantile accuracy audit —
what a deterministic 10% Bernoulli sample costs in quantile error.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_SAMPLED_Q_ORACLE = """
WITH vals AS (
  SELECT event_id, CAST(round(value * 100.0) AS BIGINT) AS cents FROM events
),
sampled AS (
  SELECT cents FROM vals
  WHERE CAST(concat('0x',
        substr(md5('sq:' || CAST(event_id AS VARCHAR)), 1, 2)) AS INTEGER) < 26
),
ft AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
st AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sampled),
fcum AS (
  SELECT cents, sum(c) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM (SELECT cents, count(*) AS c FROM vals GROUP BY cents)
),
scum AS (
  SELECT cents, sum(c) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM (SELECT cents, count(*) AS c FROM sampled GROUP BY cents)
),
q AS (SELECT unnest([50, 90, 99]) AS p)
SELECT q.p AS percentile,
       round(CAST((SELECT min(cents) FROM fcum, ft
                   WHERE cc * 100 >= ft.n * q.p) AS DOUBLE) / 100.0, 2)
         AS exact_value,
       round(CAST((SELECT min(cents) FROM scum, st
                   WHERE cc * 100 >= st.n * q.p) AS DOUBLE) / 100.0, 2)
         AS sampled_value,
       round(abs(
         CAST((SELECT min(cents) FROM fcum, ft
               WHERE cc * 100 >= ft.n * q.p) AS DOUBLE)
         - (SELECT min(cents) FROM scum, st
            WHERE cc * 100 >= st.n * q.p))
         / (SELECT min(cents) FROM fcum, ft
            WHERE cc * 100 >= ft.n * q.p), 6) AS rel_error
FROM q
ORDER BY percentile
"""


@register(
    "sampled_quantile_error",
    oracle=_SAMPLED_Q_ORACLE,
    doc="Sampling-accuracy audit: nearest-rank p50/p90/p99 of the "
    "value column computed on the FULL data and on a deterministic "
    "~10% Bernoulli sample (md5 bucket < 26/256 on event_id — "
    "reproducible, no RNG), with the relative error of each "
    "sampled quantile. This quantifies the scale technique "
    "everyone reaches for at 100 TB ('just sample it') on the "
    "exact workload where it degrades — tail quantiles, where "
    "the p99 sits on ~1% of sampled points. Both percentile "
    "ladders use the distinct-value cumulative machinery; all "
    "rank comparisons are integer cross-multiplications.",
    tags=("stats", "sampling", "ops"),
)
def sampled_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    vals = ev.select(
        "event_id", F.round(F.col("value") * 100.0).cast("long").alias("cents")
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sq:"), F.col("event_id").cast("string"))), 1, 2
        ),
        16,
        10,
    ).cast("int")
    sampled = vals.filter(bucket < 26).select("cents")

    def ladder(df: DataFrame):
        tot = df.agg(F.count("*").alias("n"))
        cum = (
            df.groupBy("cents")
            .agg(F.count("*").alias("c"))
            .select(
                "cents",
                F.sum("c")
                .over(
                    Window.orderBy("cents").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                )
                .alias("cc"),
            )
        )
        return cum.crossJoin(F.broadcast(tot))

    full = ladder(vals.select("cents"))
    samp = ladder(sampled)
    q = spark.createDataFrame([(50,), (90,), (99,)], "p long")

    def pick(c, name):
        return (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("cc") * 100 >= F.col("n") * F.col("p"))
            .groupBy("p")
            .agg(F.min("cents").alias(name))
        )

    fq = pick(full, "exact_cents")
    sq = pick(samp, "sampled_cents")
    return (
        fq.join(sq, "p")
        .select(
            F.col("p").alias("percentile"),
            F.round(F.col("exact_cents").cast("double") / 100.0, 2).alias(
                "exact_value"
            ),
            F.round(F.col("sampled_cents").cast("double") / 100.0, 2).alias(
                "sampled_value"
            ),
            F.round(
                F.abs(
                    F.col("exact_cents").cast("double")
                    - F.col("sampled_cents")
                )
                / F.col("exact_cents"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("percentile")
    )
