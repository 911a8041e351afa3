"""Advanced analytics batch 13: streamed watermarked ingest-dedup
under the oracle gate, and bounded Bellman-Ford weighted shortest
paths.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.queries_graph import _TRI_EDGES_CTE, _shifted_edges
from memories_spark.plans.registry import register
from memories_spark.sources.tables import _restore_timestamps, load_tables
from memories_spark.streaming.events import dedup_event_stream

# ---------------------------------------------------------------------
# Streamed ingest-dedup (dropDuplicatesWithinWatermark) == batch DISTINCT
# ---------------------------------------------------------------------

_STREAM_DEDUP_ORACLE = """
SELECT event_type,
       CAST(count(DISTINCT (user_id, date_trunc('minute', ts))) AS BIGINT)
         AS n_keys
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "streamed_dedup_counts",
    oracle=_STREAM_DEDUP_ORACLE,
    doc="The at-least-once ingest-dedup operator run as a REAL "
    "streaming query to completion and oracle-checked: events "
    "stream through dropDuplicatesWithinWatermark keyed on "
    "(user_id, event_type, minute) (streaming/events."
    "dedup_event_stream — state bounded by the watermark horizon, "
    "not stream lifetime), the surviving rows land in the sink, "
    "and the per-type count of kept rows must equal the ANSI-SQL "
    "COUNT(DISTINCT key) of the same data. Which duplicate "
    "survives is arrival-order-dependent; HOW MANY survive is "
    "not — that is exactly the deterministic contract an "
    "at-least-once pipeline guarantees downstream. Fourth "
    "streaming operator under the oracle gate (tumbling windows, "
    "sessionization, funnel, now dedup).",
    tags=("streaming", "dedup"),
)
def streamed_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="stream_dedup_")
    os.symlink(os.path.abspath(path), os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(path).schema
    stream = _restore_timestamps(
        "events", spark.readStream.schema(schema).parquet(stage)
    )
    keyed = stream.withColumn("minute", F.date_trunc("minute", F.col("ts")))
    deduped = dedup_event_stream(
        keyed, watermark="2 hours", keys=["user_id", "event_type", "minute"]
    )
    qname = f"stream_dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.select("user_id", "event_type", "minute")
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from memories_spark.streaming import drain_stream

    drain_stream(q)
    return (
        spark.table(qname)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Bounded Bellman-Ford (weighted multi-source shortest paths)
# ---------------------------------------------------------------------

_BF_ROUNDS = 4

def _bf_oracle() -> str:
    # chained-CTE relaxation: r{k+1} = min(r{k}, r{k} + edge)
    ctes = [
        """
r0 AS (SELECT doc_id AS id, CAST(0 AS BIGINT) AS d FROM documents
       WHERE doc_id < 20)"""
    ]
    for k in range(_BF_ROUNDS):
        ctes.append(f"""
r{k + 1} AS (
  SELECT id, min(d) AS d FROM (
    SELECT id, d FROM r{k}
    UNION ALL
    SELECT b.b AS id, r{k}.d + b.w AS d
    FROM r{k} JOIN bidir b ON b.a = r{k}.id
  ) GROUP BY id
)""")
    return (
        f"""
WITH edges AS ({_TRI_EDGES_CTE}),
bidir AS (
  SELECT ea AS a, eb AS b, 1 + (ea + eb) % 5 AS w FROM edges
  UNION ALL
  SELECT eb AS a, ea AS b, 1 + (ea + eb) % 5 AS w FROM edges
),
"""
        + ",".join(ctes)
        + f"""
SELECT d AS dist, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
FROM r{_BF_ROUNDS} GROUP BY d ORDER BY dist
"""
    )


@register(
    "weighted_shortest_paths",
    oracle=_bf_oracle(),
    doc="Bounded Bellman-Ford: minimum WEIGHTED distance from the 20 "
    "chain-head seeds over the chain+shortcut graph with edge "
    "weights 1+(ea+eb)%5, four relaxation rounds, reported as a "
    "per-distance histogram — the weighted generalization of "
    "bfs_distance_histogram (hop counts) using the same "
    "Pregel-style loop: each round is one join frontier-to-edges "
    "+ one min-groupBy, both equi on node ids, so a round costs "
    "exactly what a BFS round costs regardless of weights. "
    "Integer weights keep every distance a BIGINT. The oracle "
    "replays the identical relaxation as chained CTEs.",
    tags=("graph",),
)
def weighted_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id")
    edges = _shifted_edges(ids, 20).unionByName(_shifted_edges(ids, 40))
    w = (F.lit(1) + (F.col("ea") + F.col("eb")) % 5).cast("long")
    bidir = edges.select(
        F.col("ea").alias("a"), F.col("eb").alias("b"), w.alias("w")
    ).unionByName(
        edges.select(F.col("eb").alias("a"), F.col("ea").alias("b"), w.alias("w"))
    )
    dist = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("id"), F.lit(0).cast("long").alias("d")
    )
    for _ in range(_BF_ROUNDS):
        relaxed = dist.join(bidir, dist["id"] == bidir["a"]).select(
            F.col("b").alias("id"), (F.col("d") + F.col("w")).alias("d")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("d").alias("d"))
        )
    return (
        dist.groupBy(F.col("d").alias("dist"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("dist")
    )
