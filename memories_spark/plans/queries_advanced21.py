"""Advanced analytics batch 25: embedding-dimension profiling,
scored entity resolution, and churn cohort snapshots.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Embedding dimension profile (dead/degenerate feature audit)
# ---------------------------------------------------------------------

_DIMPROF_ORACLE = """
WITH expanded AS (
  SELECT i.i AS dim,
         CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT) AS v
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i
),
m AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss,
         CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx
  FROM expanded GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       round(CAST(s AS DOUBLE) / n / 1e6, 6) AS mean,
       round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n) / 1e6,
             6) AS stddev,
       round(CAST(mn AS DOUBLE) / 1e6, 6) AS min_v,
       round(CAST(mx AS DOUBLE) / 1e6, 6) AS max_v,
       CAST(CASE WHEN (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n
                      < 0.0001 THEN 1 ELSE 0 END AS BIGINT) AS low_variance
FROM m
ORDER BY dim
"""


@register(
    "embedding_dim_profile",
    oracle=_DIMPROF_ORACLE,
    doc="Per-dimension statistics of the embedding matrix: mean, "
    "stddev, range, and a low-variance flag for every coordinate "
    "— the feature-health audit run before training on or "
    "indexing embeddings (a dead dimension wastes index space; a "
    "dominant one distorts unnormalized distances; post-training "
    "drift here signals an encoder regression — the per-dim twin "
    "of embedding_centroid_drift). Values freeze to 1e-6 "
    "fixed-point at explode time so the moment sums are exact "
    "BIGINTs; the explode produces corpus x 64 rows but "
    "aggregates map-side to 64 groups.",
    tags=("similarity", "quality", "stats"),
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    expanded = emb.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * F.lit(1e6)).cast("long").alias("v"),
    )
    m = expanded.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / F.col("n")
    return m.select(
        "dim",
        F.round(F.col("s").cast("double") / F.col("n") / F.lit(1e6), 6).alias(
            "mean"
        ),
        F.round(F.sqrt(var) / F.lit(1e6), 6).alias("stddev"),
        F.round(F.col("mn").cast("double") / F.lit(1e6), 6).alias("min_v"),
        F.round(F.col("mx").cast("double") / F.lit(1e6), 6).alias("max_v"),
        F.when(var < 0.0001, 1).otherwise(0).cast("long").alias("low_variance"),
    ).orderBy("dim")


# ---------------------------------------------------------------------
# Scored entity resolution (weighted field agreement, blocked)
# ---------------------------------------------------------------------

_ER_ORACLE = """
WITH base AS (
  SELECT c_custkey AS id, c_name, c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
  FROM customer
),
clones AS (
  -- deterministic perturbed re-imports: every 13th customer comes
  -- back with a shifted id and a slightly different balance
  SELECT id + 1000000 AS id, c_name, c_nationkey, c_mktsegment,
         bal_cents + 37 AS bal_cents
  FROM base WHERE id % 13 = 0
),
unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM clones
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(CASE WHEN a.c_name = b.c_name THEN 50 ELSE 0 END
            + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 20 ELSE 0 END
            + CASE WHEN abs(a.bal_cents - b.bal_cents) <= 100 THEN 30 ELSE 0 END
            AS BIGINT) AS score
  FROM unioned a JOIN unioned b
    ON a.c_nationkey = b.c_nationkey AND a.id < b.id
)
SELECT id_a, id_b, score
FROM pairs WHERE score >= 80
ORDER BY id_a, id_b
"""


@register(
    "entity_resolution_scored",
    oracle=_ER_ORACLE,
    doc="Weighted-field entity resolution: deterministic perturbed "
    "'re-imports' (every 13th customer cloned with a new id and a "
    "37-cent balance drift) are matched back by a blocked scoring "
    "join — candidates must share the nation block, then score "
    "50*name + 20*segment + 30*(balance within $1) with an 80 "
    "threshold. This is the smart-import duplicate-detection "
    "shape (reference import ≥0.95 skip rule) restated for "
    "structured records: blocking bounds the pair space (the ER "
    "equivalent of LSH), integer weights make the score exact, "
    "and the synthetic clones give the oracle a verifiable "
    "recall witness.",
    tags=("dedup", "join"),
)
def entity_resolution_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir)["customer"]
    base = cust.select(
        F.col("c_custkey").alias("id"),
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0).cast("long").alias("bal_cents"),
    )
    clones = base.filter(F.col("id") % 13 == 0).select(
        (F.col("id") + 1000000).alias("id"),
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        (F.col("bal_cents") + 37).alias("bal_cents"),
    )
    unioned = base.unionByName(clones)
    b = unioned.select(
        F.col("id").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("bal_cents").alias("bal_b"),
    )
    score = (
        F.when(F.col("c_name") == F.col("name_b"), 50).otherwise(0)
        + F.when(F.col("c_mktsegment") == F.col("seg_b"), 20).otherwise(0)
        + F.when(F.abs(F.col("bal_cents") - F.col("bal_b")) <= 100, 30).otherwise(0)
    ).cast("long")
    return (
        unioned.join(
            b,
            (F.col("c_nationkey") == F.col("nat_b")) & (F.col("id") < F.col("id_b")),
        )
        .select(F.col("id").alias("id_a"), "id_b", score.alias("score"))
        .filter(F.col("score") >= 80)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------
# Churn cohort snapshot
# ---------------------------------------------------------------------

_CHURN_ORACLE = """
WITH bounds AS (
  SELECT CAST(floor(epoch(max(ts))) AS BIGINT) - 604800 AS cutoff FROM events
),
users AS (
  SELECT user_id,
         CAST(max(CASE WHEN floor(epoch(ts)) >= b.cutoff THEN 1 ELSE 0 END)
              AS BIGINT) AS active_last_wk,
         CAST(max(CASE WHEN floor(epoch(ts)) < b.cutoff THEN 1 ELSE 0 END)
              AS BIGINT) AS active_before,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases
  FROM events, bounds b GROUP BY user_id
),
labeled AS (
  SELECT CASE
           WHEN active_before = 1 AND active_last_wk = 0 THEN 'churned'
           WHEN active_before = 1 AND active_last_wk = 1 THEN 'retained'
           ELSE 'new'
         END AS cohort,
         n_events, n_purchases
  FROM users
)
SELECT cohort,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS events_total,
       round(CAST(sum(n_purchases) AS DOUBLE) / count(*), 6)
         AS purchases_per_user
FROM labeled
GROUP BY cohort
ORDER BY cohort
"""


@register(
    "churn_cohort_snapshot",
    oracle=_CHURN_ORACLE,
    doc="Churn snapshot relative to the corpus's last week: users "
    "active before the cutoff but silent since are CHURNED, active "
    "on both sides RETAINED, first seen inside the window NEW — "
    "with per-cohort volume and purchase intensity (the churned "
    "cohort's historical purchase rate is what a win-back "
    "campaign's expected value is priced on). The cutoff is "
    "data-derived (max ts - 7d, a 1-row broadcast) so the query "
    "is reproducible on any snapshot; per-user collapse is one "
    "conditional groupBy.",
    tags=("product", "temporal"),
)
def churn_cohort_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(
        (F.unix_timestamp(F.max("ts")) - 604800).alias("cutoff")
    )
    t = F.unix_timestamp("ts")
    users = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(F.when(t >= F.col("cutoff"), 1).otherwise(0)).alias(
                "active_last_wk"
            ),
            F.max(F.when(t < F.col("cutoff"), 1).otherwise(0)).alias(
                "active_before"
            ),
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
        )
    )
    cohort = (
        F.when(
            (F.col("active_before") == 1) & (F.col("active_last_wk") == 0),
            "churned",
        )
        .when(
            (F.col("active_before") == 1) & (F.col("active_last_wk") == 1),
            "retained",
        )
        .otherwise("new")
    )
    return (
        users.select(
            cohort.alias("cohort"), "n_events", "n_purchases"
        )
        .groupBy("cohort")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").alias("events_total"),
            F.round(
                F.sum("n_purchases").cast("double") / F.count("*"), 6
            ).alias("purchases_per_user"),
        )
        .orderBy("cohort")
    )
