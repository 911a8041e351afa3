"""Advanced analytics batch 35: watermark lateness audit — the batch
query that tunes streaming watermarks.

Determinism contract as per the registry module docstring. The
running max over arrival order uses the same two-phase decomposition
as peak_concurrency (bucketed prefix max + tiny offset pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_HORIZONS_S = (60, 600, 3600)

_LATENESS_ORACLE = f"""
WITH arr AS (
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
hwm AS (
  SELECT event_id, t,
         max(t) OVER (ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM arr
),
h AS (SELECT unnest([{", ".join(str(x) for x in _HORIZONS_S)}]) AS horizon_s),
flagged AS (
  SELECT h.horizon_s,
         CASE WHEN hwm.wm IS NOT NULL AND hwm.t < hwm.wm - h.horizon_s
              THEN 1 ELSE 0 END AS late
  FROM hwm, h
)
SELECT CAST(horizon_s AS BIGINT) AS horizon_s,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late,
       round(CAST(sum(late) AS DOUBLE) / count(*), 6) AS late_share
FROM flagged
GROUP BY horizon_s
ORDER BY horizon_s
"""


@register(
    "watermark_lateness_audit",
    oracle=_LATENESS_ORACLE,
    doc="Watermark tuning as a batch query: replaying events in "
    "arrival order (event_id), an event is LATE for horizon H when "
    "its event time trails the running high-water-mark by more "
    "than H — exactly the rows Structured Streaming's "
    "withWatermark(H) would drop from the stateful operators this "
    "repo runs (streamed sessions, funnel, dedup). The per-horizon "
    "late shares ARE the watermark decision: pick the smallest H "
    "with acceptable loss, because state size grows linearly in "
    "H. The running max decomposes into per-bucket prefix maxima "
    "plus one tiny offset pass (max is associative — same "
    "two-phase trick as peak_concurrency), so no single task scans "
    "the whole stream; the 3-row horizon table broadcasts.",
    tags=("streaming", "ops", "temporal"),
)
def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    arr = ev.select(
        "event_id", F.unix_timestamp("ts").alias("t")
    ).withColumn("bucket", F.expr("event_id DIV 1000"))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = arr.withColumn("wm_in", F.max("t").over(w_in))
    btot = arr.groupBy("bucket").agg(F.max("t").alias("bmax"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "bucket", F.max("bmax").over(w_off).alias("prev_max")
    )
    hwm = within.join(F.broadcast(offsets), "bucket").select(
        "event_id",
        "t",
        F.greatest(
            F.coalesce(F.col("wm_in"), F.lit(None)),
            F.coalesce(F.col("prev_max"), F.lit(None)),
        ).alias("wm"),
    )
    horizons = spark.createDataFrame(
        [(h,) for h in _HORIZONS_S], "horizon_s long"
    )
    flagged = hwm.crossJoin(F.broadcast(horizons)).select(
        "horizon_s",
        F.when(
            F.col("wm").isNotNull()
            & (F.col("t") < F.col("wm") - F.col("horizon_s")),
            1,
        )
        .otherwise(0)
        .alias("late"),
    )
    return (
        flagged.groupBy("horizon_s")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("late").alias("n_late"),
        )
        .select(
            "horizon_s",
            "n_events",
            "n_late",
            F.round(
                F.col("n_late").cast("double") / F.col("n_events"), 6
            ).alias("late_share"),
        )
        .orderBy("horizon_s")
    )
