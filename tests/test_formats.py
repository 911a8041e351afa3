"""Interchange-format round-trips: CSV / JSON-lines / parquet / ORC
must preserve the events table exactly (values, nulls, timestamps at
microsecond precision) under explicit schemas.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from memories_spark.sources import formats
from memories_spark.sources.tables import load_tables

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _canon(df):
    """Comparable canonical rows (timestamps to micros, value to cents)."""
    return sorted(
        df.select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "props",
        ).collect()
    )


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"].select(*[f.name for f in SCHEMA])
    path = str(tmp_path / "ev_csv")
    formats.write_csv(ev, path)
    back = formats.read_csv(spark, path, SCHEMA)
    assert _canon(back) == _canon(ev)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"].select(*[f.name for f in SCHEMA])
    path = str(tmp_path / "ev_json")
    formats.write_jsonl(ev, path)
    back = formats.read_jsonl(spark, path, SCHEMA)
    assert _canon(back) == _canon(ev)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"].select(*[f.name for f in SCHEMA])
    path = str(tmp_path / "ev_orc")
    formats.write_orc(ev, path, partition_by="event_type")
    back = formats.read_orc(spark, path)
    assert _canon(back.select(*[f.name for f in SCHEMA])) == _canon(ev)


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"].select(*[f.name for f in SCHEMA])
    path = str(tmp_path / "ev_parq")
    formats.write_parquet(ev, path, partition_by="event_type")
    back = formats.read_parquet(spark, path)
    # partition column comes back; values must match exactly
    assert _canon(back.select(*[f.name for f in SCHEMA])) == _canon(ev)
