"""Training-data pipeline queries: deterministic stratified sampling
and quality-filter keep/drop decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_sql
from memories_spark.operators import textstats as ts_op
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------

# per-language sampling rates out of 100 (downsample the dominant
# language, keep the long tail whole — the standard corpus-balancing
# move in web-scale training sets)
_RATES = {"en": 40, "de": 100, "es": 100, "fr": 100, "zh": 100}

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in sorted(_RATES.items())
) + " ELSE 100 END"

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE CAST(('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      < {_RATE_CASE}
ORDER BY doc_id
"""


@register(
    "stratified_sample",
    oracle=_SAMPLE_ORACLE,
    doc="Deterministic stratified sampling for corpus balancing: keep "
    "a row iff md5('s42:'||id) mod 100 falls under its stratum's "
    "rate (en downsampled to 40%, tail languages kept whole). "
    "Hash-gated instead of rand() so the sample is reproducible "
    "across engines, runs and partitionings — resampling with a "
    "different seed string is a one-literal change. One scan, no "
    "shuffle, the predicate is pure codegen.",
    tags=("training", "sampling"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    gate = F.conv(
        F.substring(F.md5(F.concat(F.lit("s42:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % 100
    rate = F.expr(_RATE_CASE)
    return (
        docs.filter(gate < rate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# Quality-filter decisions with reasons
# ---------------------------------------------------------------------

_MIN_CHARS = 64
_MIN_TOKENS = 12
_MIN_QUALITY = 0.35

_QF_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         n_chars,
         len({tokens_sql('text')}) AS n_tokens,
         {ts_op.quality_score_sql('text')} AS quality
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN n_chars >= {_MIN_CHARS}
                  AND n_tokens >= {_MIN_TOKENS}
                  AND quality >= {_MIN_QUALITY} THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CASE WHEN n_chars < {_MIN_CHARS} THEN 'too_short'
            WHEN n_tokens < {_MIN_TOKENS} THEN 'too_few_tokens'
            WHEN quality < {_MIN_QUALITY} THEN 'low_quality'
            ELSE 'ok' END AS reason,
       round(quality, 6) AS quality
FROM scored ORDER BY doc_id
"""


@register(
    "quality_filter_decisions",
    oracle=_QF_ORACLE,
    doc="Gopher/C4-style keep/drop decision per document with the "
    "first failing rule as the reason (length floor, token floor, "
    "composite quality floor) — the auditable form of a training-"
    "data filter: reasons make drop-rate dashboards and rule "
    "tuning possible. One scan, all codegen expressions.",
    tags=("training", "quality"),
)
def quality_filter_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select(
        "doc_id", "n_chars", "text", ts_op.tokens_expr("text").alias("toks")
    )
    n_tokens = F.size(F.col("toks"))
    quality = ts_op.quality_score_expr("text", F.col("toks"))
    keep = (
        (F.col("n_chars") >= _MIN_CHARS)
        & (n_tokens >= _MIN_TOKENS)
        & (quality >= _MIN_QUALITY)
    )
    reason = (
        F.when(F.col("n_chars") < _MIN_CHARS, "too_short")
        .when(n_tokens < _MIN_TOKENS, "too_few_tokens")
        .when(quality < _MIN_QUALITY, "low_quality")
        .otherwise("ok")
    )
    return (
        toked.select(
            "doc_id",
            keep.cast("long").alias("keep"),
            reason.alias("reason"),
            F.round(quality, 6).alias("quality"),
        )
        .orderBy("doc_id")
    )
