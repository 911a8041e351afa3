"""Advanced analytics batch 20: classical statistical tests as
distributed queries — chi-squared independence, two-sample
Kolmogorov-Smirnov, and a Benford first-digit audit.

Determinism: chi-squared terms use the exact-integer identity
(O*N - rt*ct)^2 / (N*rt*ct) with each term frozen to fixed point;
the KS statistic is a pure integer maximization (|cumA*nB - cumB*nA|)
divided only at output; Benford digits come from string truncation,
not log10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Chi-squared independence: event_type x day-of-week
# ---------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type,
         ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7) AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT CAST(round(
           CAST(cells.o * n.n - rt.r * ct.c AS DOUBLE)
           * CAST(cells.o * n.n - rt.r * ct.c AS DOUBLE)
           / (CAST(n.n AS DOUBLE) * rt.r * ct.c) * 1e6) AS BIGINT) AS t_fp
  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), n
)
SELECT (SELECT CAST((count(*) - 1) AS BIGINT) FROM rt)
         * (SELECT CAST((count(*) - 1) AS BIGINT) FROM ct) AS dof,
       (SELECT n FROM n) AS n_events,
       round(CAST(sum(t_fp) AS DOUBLE) / 1e6, 4) AS chi2
FROM terms
"""


@register(
    "chi2_type_dow_independence",
    oracle=_CHI2_ORACLE,
    doc="Chi-squared test of independence between event type and "
    "day-of-week — 'is activity mix different on weekends?' as a "
    "query. Each cell's contribution uses the exact-integer "
    "identity (O*N - rowTot*colTot)^2 / (N*rowTot*colTot), with "
    "the BIGINT difference formed exactly before any float touches "
    "it and each term frozen to fixed point before the sum, so "
    "the statistic is identical at any parallelism. The "
    "contingency table is one groupBy of the fact table; row/col "
    "marginals re-aggregate the ~35-cell rollup. Day-of-week is "
    "epoch arithmetic (no engine dow() conventions).",
    tags=("stats",),
)
def chi2_type_dow_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    dow = ((F.unix_timestamp("ts") / F.lit(86400)).cast("long") + 4) % 7
    cells = ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count("*").alias("o")
    )
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    terms = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                diff
                * diff
                / (F.col("n").cast("double") * F.col("r") * F.col("c"))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("t_fp"),
            "n",
        )
    )
    dof_r = rt.agg((F.count("*") - 1).alias("dr"))
    dof_c = ct.agg((F.count("*") - 1).alias("dc"))
    return (
        terms.agg(
            F.first("n").alias("n_events"), F.sum("t_fp").alias("s")
        )
        .crossJoin(F.broadcast(dof_r))
        .crossJoin(F.broadcast(dof_c))
        .select(
            (F.col("dr") * F.col("dc")).cast("long").alias("dof"),
            "n_events",
            F.round(F.col("s").cast("double") / F.lit(1e6), 4).alias("chi2"),
        )
    )


# ---------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov: purchase values, arm A vs arm B
# ---------------------------------------------------------------------

_KS_ORACLE = """
WITH vals AS (
  SELECT CASE WHEN CAST(concat('0x',
              substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 2))
              AS INTEGER) < 128
              THEN 'A' ELSE 'B' END AS grp,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
n AS (
  SELECT CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM vals
),
dv AS (
  SELECT cents,
         CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM vals GROUP BY cents
),
cum AS (
  SELECT cents,
         sum(ca) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         sum(cb) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
  FROM dv
),
scored AS (
  SELECT cents, abs(cuma * n.nb - cumb * n.na) AS d_num FROM cum, n
),
best AS (
  SELECT cents, d_num,
         row_number() OVER (ORDER BY d_num DESC, cents ASC) AS rk
  FROM scored
)
SELECT n.na AS n_a, n.nb AS n_b,
       round(CAST(b.d_num AS DOUBLE) / (CAST(n.na AS DOUBLE) * n.nb), 6)
         AS d_stat,
       round(CAST(b.cents AS DOUBLE) / 100.0, 2) AS d_at_value
FROM best b, n WHERE b.rk = 1
"""


@register(
    "ks_two_sample_values",
    oracle=_KS_ORACLE,
    doc="Two-sample Kolmogorov-Smirnov distance between the purchase- "
    "value distributions of the two hash-split experiment arms "
    "(the distributional companion to ab_test_proportions' "
    "rate test — a treatment can leave the rate alone and still "
    "shift WHERE the money is). The KS supremum is a pure integer "
    "maximization: D = max |cumA*nB - cumB*nA| / (nA*nB), "
    "evaluated over the DISTINCT cents values' cumulative table, "
    "reported with the value where the gap peaks. Integer "
    "cross-multiplication avoids ECDF floats entirely until the "
    "final division.",
    tags=("stats", "product"),
)
def ks_two_sample_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 2
        ),
        16,
        10,
    ).cast("int")
    vals = ev.filter(F.col("event_type") == "purchase").select(
        F.when(bucket < 128, "A").otherwise("B").alias("grp"),
        F.round(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    n = vals.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("nb"),
    )
    dv = vals.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = dv.select(
        "cents",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    scored = cum.crossJoin(F.broadcast(n)).select(
        "cents",
        "na",
        "nb",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")).alias(
            "d_num"
        ),
    )
    best = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("d_num").desc(), F.col("cents").asc())
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return best.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(
            F.col("d_num").cast("double")
            / (F.col("na").cast("double") * F.col("nb")),
            6,
        ).alias("d_stat"),
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("d_at_value"),
    )


# ---------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(value * 100.0) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM events WHERE CAST(round(value * 100.0) AS BIGINT) > 0
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits)
SELECT d.digit, CAST(count(*) AS BIGINT) AS n_values,
       round(CAST(count(*) AS DOUBLE) / t.n, 6) AS observed_share,
       round(ln(1.0 + 1.0 / d.digit) / ln(10.0), 6) AS benford_share,
       round(CAST(count(*) AS DOUBLE) / t.n
             - ln(1.0 + 1.0 / d.digit) / ln(10.0), 6) AS excess
FROM digits d, tot t
GROUP BY d.digit, t.n
ORDER BY d.digit
"""


@register(
    "benford_first_digit_audit",
    oracle=_BENFORD_ORACLE,
    doc="Benford's-law audit of the value column: observed first- "
    "significant-digit shares vs the log10(1+1/d) expectation — "
    "the forensic screen for fabricated or truncated numeric "
    "data (synthetic uniform values fail it loudly, which is "
    "itself the point: the audit should flag this corpus). The "
    "first digit comes from STRING truncation of the exact cents "
    "integer, not floor(log10) — log10 of 10^k at double "
    "precision is the classic off-by-one trap this sidesteps. "
    "One conditional groupBy; the total broadcasts.",
    tags=("stats", "quality", "ops"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    cents = F.round(F.col("value") * 100.0).cast("long")
    digits = ev.filter(cents > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    tot = digits.agg(F.count("*").alias("n"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(
        F.lit(10.0)
    )
    return (
        digits.groupBy("digit")
        .agg(F.count("*").alias("n_values"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_values",
            F.round(F.col("n_values").cast("double") / F.col("n"), 6).alias(
                "observed_share"
            ),
            F.round(benford, 6).alias("benford_share"),
            F.round(
                F.col("n_values").cast("double") / F.col("n") - benford, 6
            ).alias("excess"),
        )
        .orderBy("digit")
    )
