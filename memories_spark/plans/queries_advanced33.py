"""Advanced analytics batch 37: HyperLogLog distinct sketch, rank-based
ROC AUC, and contrastive hard-negative mining.

Three shapes a 100 TB training-data platform runs constantly:
cardinality estimation with O(m) mergeable state (the COUNT(DISTINCT)
replacement), classifier evaluation without a plotting library, and
negative-pair construction for contrastive/embedding training.

Determinism contract as per the registry module docstring. The HLL
register math is string/integer arithmetic on md5 hex digests (both
engines produce identical digests); the only transcendental is one
``ln`` on an exact rational in the small-range correction, rounded at
1e-6 fixed point (same pattern as the Kaplan-Meier / surprisal
queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import hex_prefix_int_sql
from memories_spark.functions.vectors import cosine_expr, cosine_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# HyperLogLog distinct estimate (m = 64 registers, Flajolet et al. 2007)
# ---------------------------------------------------------------------

_HLL_M = 64  # registers (p = 6 bits)
_HLL_ALPHA = 0.709  # alpha_64 from the HLL paper (m = 64)
_HLL_RHO_DIGITS = 11  # hex digits scanned for the rho pattern (44 bits)

# rho = 1 + (# leading zero BITS of the 44-bit suffix), computed on the
# hex string itself: 4 bits per leading '0' char, plus the intra-nibble
# leading zeros of the first non-zero hex digit. Pure string CASE logic
# -> bit-identical across engines (no log2 / float bit tricks).
_NIBBLE_LZ = (
    "CASE WHEN {d} IN ('8','9','a','b','c','d','e','f') THEN 0 "
    "WHEN {d} IN ('4','5','6','7') THEN 1 "
    "WHEN {d} IN ('2','3') THEN 2 ELSE 3 END"
)


def _rho_sql(hex_expr: str) -> str:
    """SQL for rho(suffix): position of the first 1-bit in the 44-bit
    suffix of ``hex_expr`` (digits 3..13), all-zero suffix -> 45."""
    digits = _HLL_RHO_DIGITS
    suffix = f"substring({hex_expr}, 3, {digits})"
    # index (1-based) of first non-'0' char; 0 when all zeros
    nz_tail = f"ltrim({suffix}, '0')"
    first_nz = f"(CASE WHEN {nz_tail} = '' THEN 0 ELSE {digits} - length({nz_tail}) + 1 END)"
    first_digit = f"substring({nz_tail}, 1, 1)"
    nib = _NIBBLE_LZ.format(d=first_digit)
    return (
        f"(CASE WHEN {first_nz} = 0 THEN {4 * digits + 1} "
        f"ELSE ({first_nz} - 1) * 4 + ({nib}) + 1 END)"
    )


_HLL_ORACLE = f"""
WITH hashed AS (
  SELECT md5('hll:' || CAST(o_custkey AS VARCHAR)) AS h
  FROM (SELECT DISTINCT o_custkey FROM orders)
),
regs AS (
  SELECT {hex_prefix_int_sql('h', 2)} % {_HLL_M} AS reg,
         {_rho_sql('h')} AS rho
  FROM hashed
),
spine AS (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS reg),
state AS (
  SELECT s.reg, COALESCE(max(r.rho), 0) AS m_j
  FROM spine s LEFT JOIN regs r ON s.reg = r.reg
  GROUP BY s.reg
),
summed AS (
  SELECT CAST(sum(CAST(1 AS BIGINT) << (45 - CASE WHEN m_j > 45 THEN 45 ELSE m_j END)) AS BIGINT) AS s_scaled,
         CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM state
),
est AS (
  SELECT s_scaled, zeros,
         CAST({(_HLL_ALPHA * _HLL_M * _HLL_M * float(2**45))!r} AS DOUBLE) / s_scaled AS raw,
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS exact_distinct
  FROM summed
)
SELECT exact_distinct, zeros AS zero_registers, s_scaled AS sum_scaled,
       round(raw, 4) AS estimate_raw,
       round(CASE WHEN raw <= {2.5 * _HLL_M!r} AND zeros > 0
                  THEN {float(_HLL_M)!r} * (CAST(round(ln({float(_HLL_M)!r} / zeros) * 1e6) AS BIGINT) / 1e6)
                  ELSE raw END, 4) AS estimate
FROM est
"""


@register(
    "hll_distinct_estimate",
    oracle=_HLL_ORACLE,
    doc="HyperLogLog cardinality sketch over orders.o_custkey: m=64 "
    "registers, register index from the first 2 md5 hex digits, "
    "rho from the leading-zero count of the 44-bit suffix — "
    "computed as pure string CASE arithmetic on the hex digest so "
    "both engines agree bit-for-bit. The harmonic-mean denominator "
    "sum(2^-M_j) is kept exact by scaling to 2^45 (every term a "
    "BIGINT power of two); the small-range linear-counting "
    "correction m*ln(m/V) freezes its ln at 1e-6 fixed point. "
    "State is O(m) integers per group and merges by per-register "
    "MAX — the mergeable-sketch contract that lets 1000 executors "
    "estimate distincts over 100 TB with a 64-number shuffle "
    "payload (vs KMV's k hashes; see kmv_distinct_estimate). "
    "Reference parity: stats endpoints count distinct sources "
    "(reference memory_store.py stats); at fleet scale this is how "
    "that number stays cheap.",
    tags=("sketch", "stats"),
)
def hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    digits = _HLL_RHO_DIGITS

    hashed = (
        orders.select("o_custkey")
        .distinct()
        .select(
            F.md5(
                F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))
            ).alias("h")
        )
    )
    # NB: Spark's two-arg ltrim is (trimStr, str) — reversed vs DuckDB.
    nz_tail = F.expr(f"ltrim('0', substring(h, 3, {digits}))")
    first_nz = F.when(nz_tail == "", F.lit(0)).otherwise(
        F.lit(digits) - F.length(nz_tail) + 1
    )
    first_digit = F.substring(nz_tail, 1, 1)
    nib = (
        F.when(first_digit.isin(*"89abcdef"), 0)
        .when(first_digit.isin(*"4567"), 1)
        .when(first_digit.isin(*"23"), 2)
        .otherwise(3)
    )
    rho = F.when(first_nz == 0, F.lit(4 * digits + 1)).otherwise(
        (first_nz - 1) * 4 + nib + 1
    )
    reg = F.expr(hex_prefix_int_sql("h", 2)) % _HLL_M

    regs = hashed.select(reg.alias("reg"), rho.alias("rho"))
    # Map-side combine: per-register MAX is the HLL merge operation.
    per_reg = regs.groupBy("reg").agg(F.max("rho").alias("m_j"))
    spine = spark.range(_HLL_M).select(F.col("id").alias("reg"))
    state = (
        spine.join(per_reg, "reg", "left")
        .select("reg", F.coalesce("m_j", F.lit(0)).alias("m_j"))
    )
    summed = state.agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 45 - least(m_j, 45))")
        ).alias("s_scaled"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("zeros"),
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    est = summed.crossJoin(F.broadcast(exact)).withColumn(
        "raw",
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(2**45))
        / F.col("s_scaled"),
    )
    ln_fixed = (
        F.round(F.log(F.lit(float(_HLL_M)) / F.col("zeros")) * 1e6).cast(
            "long"
        )
        / 1e6
    )
    return est.select(
        "exact_distinct",
        F.col("zeros").cast("long").alias("zero_registers"),
        F.col("s_scaled").cast("long").alias("sum_scaled"),
        F.round("raw", 4).alias("estimate_raw"),
        F.round(
            F.when(
                (F.col("raw") <= 2.5 * _HLL_M) & (F.col("zeros") > 0),
                F.lit(float(_HLL_M)) * ln_fixed,
            ).otherwise(F.col("raw")),
            4,
        ).alias("estimate"),
    )


# ---------------------------------------------------------------------
# ROC AUC via the Mann-Whitney U statistic (midranks, exact integers)
# ---------------------------------------------------------------------

_AUC_ORACLE = """
WITH scored AS (
  SELECT CAST(round(value * 100.0) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE event_type IN ('purchase', 'view')
),
groups AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(pos) AS BIGINT) AS pos_cnt
  FROM scored GROUP BY v
),
cum AS (
  SELECT v, cnt, pos_cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
  FROM groups
),
sums AS (
  SELECT CAST(sum(pos_cnt * (2 * below + cnt + 1)) AS BIGINT) AS two_midrank_sum,
         CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
         CAST(sum(cnt - pos_cnt) AS BIGINT) AS n_neg
  FROM cum
)
SELECT n_pos, n_neg,
       CAST(two_midrank_sum - n_pos * (n_pos + 1) AS BIGINT) AS two_u,
       round(CAST(two_midrank_sum - n_pos * (n_pos + 1) AS DOUBLE)
             / (2.0 * n_pos * n_neg), 6) AS auc
FROM sums
"""


@register(
    "roc_auc_score",
    oracle=_AUC_ORACLE,
    doc="ROC AUC of `value` as a purchase-vs-view classifier, via the "
    "Mann-Whitney U identity AUC = (sum of positive midranks - "
    "nPos(nPos+1)/2) / (nPos*nNeg). Ranks come from the collapsed "
    "distinct-value table (cumulative count of smaller values + "
    "tie midrank), not a global per-row sort — the same "
    "distinct-value cumulative pattern as the percentile queries, "
    "so the only ordered pass runs over |distinct scores| rows. "
    "Everything to the final division is BIGINT (midranks doubled "
    "to stay integral under ties), making the statistic exact and "
    "order-independent. The model-evaluation primitive for any "
    "ranking/filter model trained on the pipeline's labels.",
    tags=("stats", "training"),
)
def roc_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir)["events"]
    scored = events.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        F.round(F.col("value") * 100.0).cast("long").alias("v"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
    )
    groups = scored.groupBy("v").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("pos_cnt")
    )
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = groups.select(
        "v",
        "cnt",
        "pos_cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
    )
    sums = cum.agg(
        F.sum(
            F.col("pos_cnt") * (2 * F.col("below") + F.col("cnt") + 1)
        ).alias("two_midrank_sum"),
        F.sum("pos_cnt").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos_cnt")).alias("n_neg"),
    )
    return sums.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        (
            F.col("two_midrank_sum") - F.col("n_pos") * (F.col("n_pos") + 1)
        )
        .cast("long")
        .alias("two_u"),
        F.round(
            (
                F.col("two_midrank_sum")
                - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------
# Contrastive hard-negative mining (per-label anchors, cross-label top-k)
# ---------------------------------------------------------------------

_DIM = 64
_NEG_K = 5

_HARDNEG_ORACLE = f"""
WITH anchors AS (
  SELECT label AS a_label, min(vec_id) AS a_id
  FROM embeddings GROUP BY label
),
anchor_vecs AS (
  SELECT a.a_id, a.a_label, e.embedding AS a_vec
  FROM anchors a JOIN embeddings e ON e.vec_id = a.a_id
),
cand AS (
  SELECT av.a_id, av.a_label, e.vec_id AS neg_id, e.label AS neg_label,
         round({cosine_sql('av.a_vec', 'e.embedding', _DIM)}, 9) AS sim9
  FROM anchor_vecs av JOIN embeddings e ON e.label <> av.a_label
),
ranked AS (
  SELECT a_id, a_label, neg_id, neg_label, sim9,
         row_number() OVER (PARTITION BY a_id ORDER BY sim9 DESC, neg_id ASC) AS rk
  FROM cand
)
SELECT CAST(a_id AS BIGINT) AS anchor_id, CAST(a_label AS BIGINT) AS anchor_label,
       CAST(neg_id AS BIGINT) AS negative_id, CAST(neg_label AS BIGINT) AS negative_label,
       CAST(rk AS BIGINT) AS rank,
       round(sim9, 6) AS sim
FROM ranked WHERE rk <= {_NEG_K}
ORDER BY anchor_id, rank
"""


@register(
    "hard_negative_mining",
    oracle=_HARDNEG_ORACLE,
    doc="Contrastive hard-negative mining: for one anchor per label "
    "(min vec_id), the top-5 most-cosine-similar vectors bearing a "
    "DIFFERENT label — the near-miss negatives that make "
    "contrastive / triplet embedding training converge (easy "
    "random negatives carry no gradient). Anchors (|labels| rows) "
    "broadcast against the corpus, so the plan is one scan + "
    "BroadcastNestedLoop on the label-inequality predicate + "
    "per-anchor WindowGroupLimit; at 100 TB the anchor set stays "
    "tiny and the corpus never shuffles. Similarity is the "
    "left-folded cosine rounded at 1e-9 before ranking (tie-break "
    "parity), reported at 1e-6.",
    tags=("similarity", "training"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    anchors = (
        emb.groupBy("label")
        .agg(F.min("vec_id").alias("a_id"))
        .select(F.col("label").alias("a_label"), "a_id")
    )
    anchor_vecs = (
        F.broadcast(anchors)
        .join(emb, anchors.a_id == emb.vec_id)
        .select("a_id", "a_label", F.col("embedding").alias("a_vec"))
    )
    cand = emb.join(
        F.broadcast(anchor_vecs), emb.label != anchor_vecs.a_label
    ).select(
        "a_id",
        "a_label",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.round(cosine_expr("a_vec", "embedding"), 9).alias("sim9"),
    )
    w = Window.partitionBy("a_id").orderBy(
        F.desc("sim9"), F.asc("neg_id")
    )
    ranked = cand.select(
        "*", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= _NEG_K)
    return ranked.select(
        F.col("a_id").cast("long").alias("anchor_id"),
        F.col("a_label").cast("long").alias("anchor_label"),
        F.col("neg_id").cast("long").alias("negative_id"),
        F.col("neg_label").cast("long").alias("negative_label"),
        F.col("rk").cast("long").alias("rank"),
        F.round("sim9", 6).alias("sim"),
    ).orderBy("anchor_id", "rank")
