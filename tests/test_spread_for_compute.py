"""spread_for_compute shape guarantees (operators/partitioning.py).

The helper must (a) spread narrow shuffle-free inputs — including
inputs whose only exchange is a BROADCAST (the r8 guard matched the
bare substring "Exchange", so a broadcast-join-bearing narrow input
was silently never spread), (b) leave shuffle-partitioned inputs
untouched without probing them, and (c) no-op on already-wide inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from memories_spark.operators.partitioning import spread_for_compute


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_narrow_scan_is_spread(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = spread_for_compute(docs)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert "RoundRobinPartitioning" in _plan(out)


def test_broadcast_join_input_is_spread(spark, sf_dir):
    """A narrow scan joined to an explicit broadcast has only a
    BroadcastExchange in its plan — it must still be spread."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = spark.createDataFrame([(0,)], "doc_id long")
    joined = docs.join(F.broadcast(small), "doc_id", "left")
    assert "BroadcastExchange" in _plan(joined)
    assert "Exchange hashpartitioning" not in _plan(joined)
    out = spread_for_compute(joined)
    assert "RoundRobinPartitioning" in _plan(out), (
        "broadcast-only plan was treated as shuffle-bearing and skipped"
    )
    assert out.count() == docs.count()


def test_shuffled_input_left_alone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shuffled = docs.groupBy("doc_id").agg(F.count("*").alias("n"))
    out = spread_for_compute(shuffled)
    assert out is shuffled  # returned untouched, not even re-planned
    assert "RoundRobinPartitioning" not in _plan(out)


def test_wide_input_noop(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wide = spark.createDataFrame(
        docs.limit(1).collect() * 4, docs.schema
    ).repartition(spark.sparkContext.defaultParallelism * 2)
    # repartition() adds a shuffle exchange, so the helper returns it
    # untouched via the shuffle guard — and adds no second shuffle.
    out = spread_for_compute(wide)
    assert out is wide
