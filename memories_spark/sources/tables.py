"""Parquet table loaders for the synthetic test corpus.

The driver generates a TPC-H-ish star schema plus ``events`` (usage
stream), ``documents`` (text corpus — plays the role of the
reference's ``memories`` table, reference memory_engine.py:596-611)
and ``embeddings`` (vector corpus, reference onnx_embedder.py:140-146
— 384-d there, 64-d here).

Loading is plain ``spark.read.parquet`` so Catalyst keeps full
pushdown/pruning ability; nothing is cached here (callers decide).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet writer emits TIMESTAMP(NANOS) which Spark's
# vectorized reader rejects; we read nanos as LONG and rebuild
# microsecond timestamps (DuckDB truncates ns->us identically, so the
# engines agree on every timestamp value).
_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _restore_timestamps(name: str, df: DataFrame) -> DataFrame:
    for col in _TS_COLUMNS.get(name, ()):
        field = next((f for f in df.schema.fields if f.name == col), None)
        if field is None:
            continue
        if isinstance(field.dataType, LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
        elif isinstance(field.dataType, TimestampNTZType):
            # Spark 4 infers parquet micros as TIMESTAMP_NTZ; normalize to
            # TIMESTAMP so epoch functions work. Session tz is pinned UTC.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every synthetic table as a DataFrame keyed by name."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return {
        name: _restore_timestamps(name, spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        for name in TABLE_NAMES
    }


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (SQL access)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
