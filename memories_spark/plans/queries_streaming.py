"""Structured Streaming under the oracle gate.

Most streaming behavior is pinned by checkpointed tests
(tests/test_streaming.py); this module additionally runs a real
Structured Streaming query to completion inside a ``queries()`` entry
— ``availableNow`` over the events parquet, memory sink — and hands
the materialized result to the same DuckDB comparison every batch
query faces. Stream-equals-oracle, not just stream-equals-batch:
the watermarked windowed aggregation's output is hash-checked
against ANSI SQL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.operators import temporal as temp_op
from memories_spark.plans.registry import register
from memories_spark.sources.tables import _restore_timestamps
from memories_spark.streaming.events import windowed_event_counts


@register(
    "streamed_tumbling_counts",
    oracle=temp_op.tumbling_counts_sql("events"),
    doc="The watermarked streaming tumbling-window aggregation run to "
    "completion (availableNow file stream over the events parquet, "
    "memory sink) and oracle-checked like any batch query — the "
    "stream's final state must hash-match the ANSI-SQL rollup of "
    "the same data. Exercises the real streaming execution path "
    "(stateful window operator, watermark bookkeeping, sink "
    "commit), not a batch lookalike: same plan as "
    "streaming/events.windowed_event_counts used in production "
    "with a Kafka source.",
    tags=("streaming", "window", "events"),
)
def streamed_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    # the file stream source requires a DIRECTORY; the testdata table
    # is a single parquet file, so stage a symlink in a temp dir (the
    # production source is a Kafka topic or a landing directory anyway)
    stage = tempfile.mkdtemp(prefix="stream_events_")
    os.symlink(os.path.abspath(path), os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(path).schema
    stream = _restore_timestamps(
        "events", spark.readStream.schema(schema).parquet(stage)
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    qname = f"stream_tc_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    from memories_spark.streaming import drain_stream

    drain_stream(q)
    return spark.table(qname).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        F.round(F.col("value_cents").cast("double") / 100.0, 2).alias("total_value"),
    )
