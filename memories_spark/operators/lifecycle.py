"""Lifecycle policies: longest-prefix profile resolution + archive
predicates.

Reference semantics: per-source-prefix profiles with most-specific-
prefix-wins cascade (reference extraction_profiles.py:68-113); policy
enforcement archives rows when ``age > ttl_days`` OR
(``confidence < threshold`` AND ``age > min_age_days``), never
touching pinned rows and recording evidence (reference
enforce_policies, memory_engine.py:1080-1248).

Spark shape: the profile table is tiny — broadcast it, explode
nothing. Longest-prefix match is a broadcast theta-join on
``startswith`` + a row_number window keeping the longest prefix.
The archive pass is a single scan + predicate; at 100 TB it becomes
a Delta MERGE keyed on id with the same predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_profiles(
    rows: DataFrame,
    profiles: DataFrame,
    id_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Attach the most-specific matching profile to every row.

    ``profiles`` has (source_prefix, ...knobs). Most-specific =
    longest matching prefix (prefix ASC tie-break for determinism,
    though duplicate-length matches can't share a prefix set).
    Rows with no match keep NULL knobs (caller applies defaults).
    """
    joined = rows.join(
        F.broadcast(profiles),
        F.col(source_col).startswith(F.col("source_prefix")),
        "left",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.length(F.coalesce(F.col("source_prefix"), F.lit("")))),
        F.asc("source_prefix"),
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def archive_decision(
    age_days: Column,
    confidence: Column,
    ttl_days: Column,
    conf_threshold: Column,
    min_age_days: Column,
    pinned: Column,
) -> Column:
    """The reference's archive rule as one expression:
    'ttl_expired' | 'low_confidence' | NULL (keep). Pinned rows are
    always kept (reference memory_engine.py:1096-1098)."""
    ttl_hit = ttl_days.isNotNull() & (age_days > ttl_days)
    conf_hit = (
        conf_threshold.isNotNull()
        & min_age_days.isNotNull()
        & (confidence < conf_threshold)
        & (age_days > min_age_days)
    )
    return (
        F.when(pinned, F.lit(None).cast("string"))
        .when(ttl_hit, F.lit("ttl_expired"))
        .when(conf_hit, F.lit("low_confidence"))
        .otherwise(F.lit(None).cast("string"))
    )
