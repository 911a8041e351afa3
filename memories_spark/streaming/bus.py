"""Lifecycle event bus as a Structured Streaming sink.

The reference fans lifecycle events (memory.added / updated / deleted
/ archived) out over SSE + webhooks with a 100-event ring buffer
(reference event_bus.py:22-171, S9 in SURVEY §2.1). The streaming
analog: change events are a stream, the "webhook" is a foreachBatch
sink appending NDJSON batch files (swap the writer body for an HTTP
POST in production — the delivery/retry contract lives in the sink,
not the engine), and the ring buffer is a bounded-history query over
the sink directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LIFECYCLE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("action", T.StringType()),  # added/updated/deleted/archived
        T.StructField("memory_id", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_lifecycle_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """NDJSON lifecycle-event stream (what the engine's mutation
    surface appends; reference event_bus.emit)."""
    return spark.readStream.schema(LIFECYCLE_SCHEMA).json(in_dir)


def event_bus_sink(stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """foreachBatch fan-out sink: appends each micro-batch as NDJSON
    to ``out_dir`` (one file per batch — the webhook-delivery shape;
    the reference retries per webhook, here the checkpoint gives
    at-least-once delivery and the batch id makes replays
    idempotent for consumers keyed on (batch_id, event_id))."""

    def deliver(batch: DataFrame, batch_id: int) -> None:
        (
            batch.withColumn("batch_id", F.lit(batch_id))
            .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
            .write.mode("append")
            .json(out_dir)
        )

    from memories_spark.streaming.events import start_in_streaming_pool

    return start_in_streaming_pool(
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def recent_history(spark: SparkSession, out_dir: str, n: int = 100) -> DataFrame:
    """Ring-buffer analog: the most recent ``n`` delivered events
    (reference event_bus.py keeps a 100-event deque). TakeOrdered on
    (ts, event_id) — never a full sort of the history."""
    delivered = spark.read.json(out_dir)
    return delivered.orderBy(F.desc("ts"), F.desc("event_id")).limit(n)
