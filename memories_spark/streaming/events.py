"""Structured Streaming surface: event ingestion, windowed rollups,
incremental BM25 term-stats maintenance.

The reference has no stream processing (SURVEY §2.10) — its closest
analogues are the SQLite insert-only event sinks
(usage_tracker.py:237-277) and the SSE lifecycle bus
(event_bus.py:22-171). Here those become first-class Structured
Streaming pipelines:

- ``read_event_stream``: a file-source stream of NDJSON event
  batches (the append-only sink shape; swap for Kafka in production
  with one line).
- ``windowed_event_counts``: watermarked tumbling-window aggregation
  — the streaming twin of the batch ``tumbling_event_counts`` query,
  late data handled by the watermark instead of a full recompute.
- ``incremental_term_stats_sink``: foreachBatch maintenance of the
  BM25 ``terms`` statistics — the scalable answer to the reference's
  full-corpus BM25 rebuild on every write (memory_engine.py:619,
  SURVEY §4 'Incremental vs full rebuild'). Each micro-batch merges
  only the term deltas of the new documents.

Scale notes: the stream shuffles once per window aggregation (state
is partitioned by group key); term-stats maintenance appends
per-batch partial counts and compacts on read — at 100 TB the
compaction becomes a periodic OPTIMIZE/MERGE job instead of a
read-side groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from memories_spark.functions.texttools import tokens_expr

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """NDJSON file-source event stream (append-only sink shape,
    reference S8 usage_tracker.log_*, usage_tracker.py:237-277)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(in_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type.

    Streaming twin of the batch period buckets (reference A4/A6
    PERIOD_SQL, usage_tracker.py:364-534): the watermark bounds state
    so late events older than the horizon are dropped, everything
    newer updates its window in place.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_cents",
        )
    )


def incremental_term_stats_sink(
    docs_stream: DataFrame, stats_dir: str, checkpoint_dir: str
):
    """foreachBatch sink maintaining BM25 term statistics
    incrementally: per micro-batch, append (id, term, tf) deltas —
    never a full-corpus rebuild (contrast reference
    memory_engine.py:619, which re-tokenizes everything per write).

    Returns the StreamingQuery; caller awaits/stops it. Query-time
    consumers read the directory and groupBy-compact; a periodic
    compaction job (Delta OPTIMIZE at scale) keeps read amplification
    bounded.
    """
    def process_batch(batch: DataFrame, batch_id: int) -> None:
        terms = (
            batch.select(
                F.col("doc_id").alias("id"), F.explode(tokens_expr("text")).alias("term")
            )
            .groupBy("id", "term")
            .agg(F.count("*").alias("tf"))
        )
        terms.write.mode("append").parquet(stats_dir)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_doc_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """NDJSON document stream for ingestion pipelines."""
    return spark.readStream.schema(DOC_SCHEMA).json(in_dir)
