"""Advanced analytics batch 24: storage-layout operations — zone-map
(min/max statistics) pruning audit and compaction bin packing.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Zone-map pruning audit (data skipping by file-level min/max stats)
# ---------------------------------------------------------------------

_FILE_ROWS = 500
_PRED_LO = "2024-01-10"
_PRED_HI = "2024-01-15"

_ZONEMAP_ORACLE = f"""
WITH filed AS (
  SELECT event_id // {_FILE_ROWS} AS file_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
stats AS (
  SELECT file_id, min(t) AS tmin, max(t) AS tmax,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM filed GROUP BY file_id
),
pred AS (
  SELECT CAST(floor(epoch(TIMESTAMP '{_PRED_LO}')) AS BIGINT) AS lo,
         CAST(floor(epoch(TIMESTAMP '{_PRED_HI}')) AS BIGINT) AS hi
),
classified AS (
  SELECT s.file_id, s.n_rows,
         CASE WHEN s.tmax < p.lo OR s.tmin >= p.hi THEN 'skipped'
              WHEN s.tmin >= p.lo AND s.tmax < p.hi THEN 'full'
              ELSE 'partial' END AS status
  FROM stats s, pred p
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS n_rows
FROM classified
GROUP BY status
ORDER BY status
"""


@register(
    "zonemap_pruning_audit",
    oracle=_ZONEMAP_ORACLE,
    doc="Zone-map / data-skipping audit: the events table is carved "
    "into virtual 500-row files (the row-group analogue), each "
    "file's min/max timestamp statistics are computed, and a "
    "5-day predicate classifies every file as SKIPPED (stats "
    "prove no match — never read), FULL (stats prove all match — "
    "read without filtering), or PARTIAL (must read and filter). "
    "This is exactly the min/max pruning Parquet row groups / "
    "Iceberg manifests do at 100 TB, and the audit quantifies "
    "what time-clustered layout buys: rows in 'skipped' are I/O "
    "the cluster never pays. The stats table is one groupBy; "
    "classification is a 1-row predicate broadcast.",
    tags=("ops", "temporal"),
)
def zonemap_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    filed = ev.select(
        (F.col("event_id") / F.lit(_FILE_ROWS)).cast("long").alias("file_id"),
        F.unix_timestamp("ts").alias("t"),
    )
    stats = filed.groupBy("file_id").agg(
        F.min("t").alias("tmin"),
        F.max("t").alias("tmax"),
        F.count("*").alias("n_rows"),
    )
    lo = F.unix_timestamp(F.lit(_PRED_LO).cast("timestamp"))
    hi = F.unix_timestamp(F.lit(_PRED_HI).cast("timestamp"))
    classified = stats.select(
        "n_rows",
        F.when((F.col("tmax") < lo) | (F.col("tmin") >= hi), "skipped")
        .when((F.col("tmin") >= lo) & (F.col("tmax") < hi), "full")
        .otherwise("partial")
        .alias("status"),
    )
    return (
        classified.groupBy("status")
        .agg(F.count("*").alias("n_files"), F.sum("n_rows").alias("n_rows"))
        .orderBy("status")
    )


# ---------------------------------------------------------------------
# Compaction bin packing (next-fit-decreasing via exclusive cumsum)
# ---------------------------------------------------------------------

_TARGET_BYTES = 200_000

_COMPACT_ORACLE = f"""
WITH files AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY source
),
ordered AS (
  SELECT source, n_docs, bytes,
         COALESCE(sum(bytes) OVER (ORDER BY bytes DESC, source ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM files
),
binned AS (
  SELECT source, n_docs, bytes, prior // {_TARGET_BYTES} AS bin
  FROM ordered
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM binned
GROUP BY bin
ORDER BY bin
"""


@register(
    "compaction_bin_packing",
    oracle=_COMPACT_ORACLE,
    doc="Compaction planning: pack per-source 'files' (doc count + "
    "byte size) into target-sized output bins by sorting "
    "largest-first and cutting the EXCLUSIVE running total at the "
    "target boundary — the deterministic relational restatement "
    "of next-fit-decreasing that needs one window pass instead of "
    "a sequential packer (greedy first-fit is inherently "
    "sequential; the cumsum cut gives the same bounded-overshoot "
    "guarantee and parallelizes). This is the small-file "
    "compaction job every lake table needs at 100 TB; the plan "
    "is a rollup + one tiny window over per-source rows. All "
    "sizes BIGINT; ties broken by source name.",
    tags=("ops",),
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    files = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("bytes")
    )
    w = Window.orderBy(F.col("bytes").desc(), F.col("source").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ordered = files.select(
        "source",
        "n_docs",
        "bytes",
        F.coalesce(F.sum("bytes").over(w), F.lit(0)).alias("prior"),
    )
    binned = ordered.select(
        "n_docs",
        "bytes",
        F.expr(f"prior DIV {_TARGET_BYTES}").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy("bin")
    )
