"""Interchange formats: CSV / JSON-lines / parquet / ORC round-trips.

The reference's interchange surface is NDJSON export/import
(reference memories_server.py export/import endpoints; our
engine.export_ndjson / import_ndjson mirror it). This module is the
generic engine-level counterpart: write any DataFrame to
CSV / JSON-lines / parquet / ORC and read it back with an explicit
schema, preserving values exactly.

Scale notes: CSV/JSON are interchange formats, not storage — no
column pruning, no predicate pushdown, full-row parsing on every
read. The helpers deliberately require an explicit schema on read:
schema inference scans the data once BEFORE the real read (2x I/O at
100 TB) and can silently mis-type columns (a numeric-looking string
column, a timestamp in an unexpected locale). Parquet is the storage
format; these exist for ingest/egress boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    """CSV with header, explicit timestamp format, gzip compression."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .option("compression", "gzip")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines (the NDJSON interchange shape), gzip-compressed."""
    (
        df.write.mode("overwrite")
        .option("timestampFormat", _TS_FMT)
        .option("compression", "gzip")
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def write_parquet(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """Snappy parquet, optionally hive-partitioned by a column."""
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_orc(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """ORC (zlib) — the other columnar storage format Spark ships a
    vectorized reader for; same pushdown/pruning properties as parquet,
    common as the interchange format with Hive/Trino warehouses."""
    w = df.write.mode("overwrite").option("compression", "zlib")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
