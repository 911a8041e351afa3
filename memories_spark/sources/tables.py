"""Parquet table loaders for the synthetic test corpus.

The driver generates a TPC-H-ish star schema plus ``events`` (usage
stream), ``documents`` (text corpus — plays the role of the
reference's ``memories`` table, reference memory_engine.py:596-611)
and ``embeddings`` (vector corpus, reference onnx_embedder.py:140-146
— 384-d there, 64-d here).

Loading is plain ``spark.read.parquet`` so Catalyst keeps full
pushdown/pruning ability; nothing is cached here (callers decide).

``load_tables`` returns a LAZY mapping: a reader is constructed only
for the tables a query actually touches. Building a reader is driver
work — file listing + a parquet footer read for schema inference —
and at 100 TB listing nine tables a query never reads is pure wasted
driver time (optimization guide §6/§7.3: file listing and planning
are single-threaded driver work). On the bench this was ~1.2 s of
overhead per query invocation (10 readers x ~0.12 s) regardless of
the query. Schemas are additionally memoized per (path, mtime, size)
— the role a table catalog/metastore plays in a real deployment —
so repeat invocations skip the footer read too; the DATA is still
read from parquet on every execution (nothing below caches rows).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType

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


# schema memo keyed on (path, mtime_ns, size): plays the catalog/
# metastore role — metadata only, never row data.
_SCHEMA_MEMO: dict[tuple[str, int, int], StructType] = {}


def _stat_key(path: str) -> tuple[str, int, int] | None:
    try:
        st = os.stat(path)
    except OSError:
        return None
    return (path, st.st_mtime_ns, st.st_size)


def read_parquet_memoized(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the schema memo: repeat reads of an
    unchanged path (testdata tables, immutable persisted indexes) skip
    the footer-inference round trip. Rows are always read from parquet
    at execution — this memoizes metadata only.

    For DIRECTORY paths the stat key is the directory's own
    mtime/size, which does not change if part files are rewritten in
    place with the same names — callers must only pass immutable
    directories. Both call sites qualify by construction: the
    testdata tables are read-only, and persisted index directories
    are content-hash named (a corpus or format change produces a NEW
    directory; see queries_ann._ensure_index) and never rewritten."""
    key = _stat_key(path)
    schema = _SCHEMA_MEMO.get(key) if key is not None else None
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    df = spark.read.parquet(path)
    if key is not None:
        _SCHEMA_MEMO[key] = df.schema
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _restore_timestamps(
        name, read_parquet_memoized(spark, f"{sf_dir}/{name}.parquet")
    )


class LazyTables(Mapping):
    """Per-call lazy table mapping: a reader exists only for the
    tables actually accessed. Each ``load_tables`` call gets a fresh
    instance (and therefore fresh readers) — no DataFrames or results
    are shared across invocations."""

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self._spark = spark
        self._sf_dir = sf_dir
        self._dfs: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        df = self._dfs.get(name)
        if df is None:
            if name not in TABLE_NAMES:
                raise KeyError(name)
            df = _read_table(self._spark, self._sf_dir, name)
            self._dfs[name] = df
        return df

    def __iter__(self) -> Iterator[str]:
        return iter(TABLE_NAMES)

    def __len__(self) -> int:
        return len(TABLE_NAMES)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> LazyTables:
    """Lazily load the synthetic tables as a DataFrame mapping."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return LazyTables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (SQL access)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
