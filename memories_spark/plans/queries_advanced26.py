"""Advanced analytics batch 30: unnormalized Haar wavelet
decomposition of the daily count series — multi-resolution analysis
in exact integers.

Determinism contract as per the registry module docstring: the
unnormalized Haar transform (pair sums and differences) keeps every
coefficient a BIGINT, so the full pyramid is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_LEVELS = 4  # 16 days -> 8 -> 4 -> 2 -> 1


def _haar_oracle() -> str:
    ctes = ["""
l0 AS (
  SELECT s.i AS idx, CAST(COALESCE(c.n, 0) AS BIGINT) AS coeff
  FROM (SELECT unnest(generate_series(0, 15)) AS i) s
  LEFT JOIN (
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) - lo.d0 AS i,
           count(*) AS n
    FROM events,
         (SELECT min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS d0
          FROM events) lo
    GROUP BY 1
  ) c ON c.i = s.i
)"""]
    details = []
    for lv in range(1, _LEVELS + 1):
        prev = f"l{lv - 1}"
        ctes.append(f"""
l{lv} AS (
  SELECT idx // 2 AS idx, CAST(sum(coeff) AS BIGINT) AS coeff
  FROM {prev} GROUP BY idx // 2
),
d{lv} AS (
  SELECT idx // 2 AS idx,
         CAST(sum(CASE WHEN idx % 2 = 0 THEN coeff ELSE -coeff END)
              AS BIGINT) AS coeff
  FROM {prev} GROUP BY idx // 2
)""")
        details.append(
            f"SELECT {lv} AS level, idx, coeff, 'detail' AS kind FROM d{lv}"
        )
    details.append(
        f"SELECT {_LEVELS} AS level, idx, coeff, 'approx' AS kind FROM l{_LEVELS}"
    )
    union = " UNION ALL ".join(details)
    return (
        "WITH " + ",".join(ctes) + f"""
SELECT CAST(level AS BIGINT) AS level, CAST(idx AS BIGINT) AS idx,
       coeff, kind
FROM ({union})
ORDER BY level, kind, idx
"""
    )


@register(
    "haar_daily_decomposition",
    oracle=_haar_oracle(),
    doc="Unnormalized Haar wavelet pyramid over the first 16 days of "
    "event counts: each level halves the series into pair SUMS "
    "(approximation) and pair DIFFERENCES (detail), yielding the "
    "multi-resolution view — which days, day-pairs, half-weeks "
    "carry the variation — that powers change detection and "
    "compressed time-series sketches. Dropping the 1/sqrt(2) "
    "normalization keeps every coefficient a BIGINT, so the whole "
    "pyramid is exact (rescaling is a display concern). Each "
    "level is one groupBy(idx DIV 2) on a table that HALVES each "
    "step — log2(n) rounds total, the classic parallel reduction "
    "shape; the densified 16-slot base makes the transform "
    "well-defined with missing days as zeros.",
    tags=("temporal", "stats"),
)
def haar_daily_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    d = ev.select(
        (F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("day")
    )
    lo = d.agg(F.min("day").alias("d0"))
    counts = (
        d.crossJoin(F.broadcast(lo))
        .select((F.col("day") - F.col("d0")).alias("i"))
        .filter(F.col("i") < 16)
        .groupBy("i")
        .agg(F.count("*").alias("n"))
    )
    spine = spark.range(0, 16).select(F.col("id").cast("long").alias("idx"))
    level = spine.join(
        counts.withColumnRenamed("i", "idx"), "idx", "left"
    ).select("idx", F.coalesce("n", F.lit(0)).cast("long").alias("coeff"))

    out = None
    for lv in range(1, _LEVELS + 1):
        half = F.expr("idx DIV 2")
        approx = level.groupBy(half.alias("idx")).agg(
            F.sum("coeff").alias("coeff")
        )
        detail = level.groupBy(half.alias("idx")).agg(
            F.sum(
                F.when(F.col("idx") % 2 == 0, F.col("coeff")).otherwise(
                    -F.col("coeff")
                )
            ).alias("coeff")
        )
        piece = detail.select(
            F.lit(lv).cast("long").alias("level"),
            "idx",
            "coeff",
            F.lit("detail").alias("kind"),
        )
        out = piece if out is None else out.unionByName(piece)
        level = approx
    out = out.unionByName(
        level.select(
            F.lit(_LEVELS).cast("long").alias("level"),
            "idx",
            "coeff",
            F.lit("approx").alias("kind"),
        )
    )
    return out.orderBy("level", "kind", "idx")
