"""Deterministic sketch operators: KMV distinct estimation, count-min
frequency estimation, Bloom-filter membership probing.

At 100 TB, exact distinct counts and exact frequency tables are often
the single most expensive shuffle in a pipeline — the sketch versions
bound state to O(k) per group / O(d*w) per sketch and merge
associatively, so they aggregate map-side and ship constant-size
partials. The reference has no sketches (its corpus fits in RAM;
full-scan exact counts everywhere, e.g. usage_tracker.py rollups),
but a migrating user at scale needs them, so they are first-class
queries here.

Everything is built on md5, which Spark and DuckDB evaluate
identically (functions/hashing.py), so unlike HLL/approx_count_
distinct these sketches are bit-reproducible across engines and
oracle-checkable: same hashes -> same k-minima / same bucket counts
-> same estimates. (Production code wanting one-line approximation
can still use Spark's approx_count_distinct; these queries pin the
engine-portable deterministic variant.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import hex_frac_sql, hex_prefix_int_sql
from memories_spark.functions.texttools import tokens_sql, tokens_expr
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# KMV (k-minimum-values) distinct estimator
# ---------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
WITH keys AS (
  SELECT DISTINCT event_type,
         md5(CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d')) AS h
  FROM events
),
fr AS (SELECT event_type, {hex_frac_sql('h')} AS f FROM keys),
ranked AS (
  SELECT event_type, f,
         row_number() OVER (PARTITION BY event_type ORDER BY f) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM fr
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS exact_distinct,
       round(CASE WHEN max(n) < {_KMV_K} THEN CAST(max(n) AS DOUBLE)
                  ELSE {_KMV_K - 1}.0 / max(CASE WHEN rn = {_KMV_K} THEN f END)
             END, 4) AS kmv_estimate
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "kmv_distinct_estimate",
    oracle=_KMV_ORACLE,
    doc="KMV (k-minimum-values, k=64) distinct-count sketch per event "
    "type over (user, day) activity keys, reported next to the exact "
    "count so the estimation error is visible in the result. The "
    "estimator is (k-1)/f_k where f_k is the k-th smallest hash "
    "fraction; groups with fewer than k keys fall back to exact (the "
    "sketch stores them all). Scale contract: k minima per group "
    "merge associatively (min-k of a union = min-k of min-k's), so "
    "partial aggregation ships 64 doubles per group per partition "
    "instead of shuffling every distinct key — this query pins the "
    "math; Spark's HLL approx_count_distinct is the one-line "
    "production alternative but is not cross-engine reproducible. "
    "Hash fractions use 13 hex digits (2^52) so the double is exact "
    "in both engines.",
    tags=("sketch", "distinct", "agg"),
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    keys = (
        ev.select(
            "event_type",
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("@"),
                    F.date_format("ts", "yyyy-MM-dd"),
                )
            ).alias("h"),
        )
        .distinct()
        .withColumn("f", F.expr(hex_frac_sql("h")))
    )
    w = Window.partitionBy("event_type").orderBy("f")
    ranked = keys.select(
        "event_type",
        "f",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("exact_distinct"),
            F.round(
                F.when(
                    F.max("n") < _KMV_K, F.max("n").cast("double")
                ).otherwise(
                    F.lit(float(_KMV_K - 1))
                    / F.max(F.when(F.col("rn") == _KMV_K, F.col("f")))
                ),
                4,
            ).alias("kmv_estimate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Count-min sketch frequency estimation
# ---------------------------------------------------------------------

_CM_SEEDS = (0, 1, 2, 3)
_CM_BUCKET_HEX = 2  # 16^2 = 256 buckets per row

_CM_ORACLE = f"""
WITH toks AS (
  SELECT unnest({tokens_sql('text')}) AS term FROM documents
),
exact AS (
  SELECT term, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY term
),
top10 AS (
  SELECT term, exact_n FROM exact ORDER BY exact_n DESC, term ASC LIMIT 10
),
seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
sketch AS (
  SELECT seed,
         substring(md5(CAST(seed AS VARCHAR) || ':' || term), 1, {_CM_BUCKET_HEX}) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM toks CROSS JOIN seeds
  GROUP BY seed, bucket
)
SELECT t.term, max(t.exact_n) AS exact_n,
       CAST(min(sk.c) AS BIGINT) AS cm_estimate,
       CAST(min(sk.c) - max(t.exact_n) AS BIGINT) AS overcount
FROM top10 t
CROSS JOIN seeds s
JOIN sketch sk
  ON sk.seed = s.seed
 AND sk.bucket = substring(md5(CAST(s.seed AS VARCHAR) || ':' || t.term), 1, {_CM_BUCKET_HEX})
GROUP BY t.term
ORDER BY exact_n DESC, term ASC
"""


@register(
    "countmin_heavy_hitters",
    oracle=_CM_ORACLE,
    doc="Count-min sketch (d=4 rows x 256 buckets, seeded md5 "
    "bucketing) probed for the top-10 exact corpus terms; reports "
    "the guaranteed-overestimate alongside the exact count so the "
    "collision overcount is visible. Scale contract: the sketch is "
    "a groupBy over (seed, bucket) — 1024 cells regardless of "
    "corpus size, built with map-side combine in one pass (the 4x "
    "seed explode happens on the already-exploded token stream "
    "before the partial agg, so only 1024 partial cells per task "
    "ever shuffle). Probing joins the 1024-row sketch by broadcast. "
    "min-over-rows is the classic CM point estimate (always >= "
    "exact).",
    tags=("sketch", "frequency", "agg", "skew"),
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(F.explode(tokens_expr("text")).alias("term"))
    exact = toks.groupBy("term").agg(F.count("*").alias("exact_n"))
    top10 = exact.orderBy(F.desc("exact_n"), F.asc("term")).limit(10)
    seeds = F.array(*[F.lit(s) for s in _CM_SEEDS])
    bucketed = toks.select(
        F.explode(seeds).alias("seed"), F.col("term")
    ).select(
        "seed",
        F.substring(
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("term"))),
            1,
            _CM_BUCKET_HEX,
        ).alias("bucket"),
    )
    sketch = bucketed.groupBy("seed", "bucket").agg(F.count("*").alias("c"))
    probes = top10.select(
        "term", "exact_n", F.explode(seeds).alias("seed")
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("term"))),
            1,
            _CM_BUCKET_HEX,
        ),
    )
    return (
        sketch.join(F.broadcast(probes), ["seed", "bucket"])
        .groupBy("term")
        .agg(
            F.max("exact_n").cast("long").alias("exact_n"),
            F.min("c").cast("long").alias("cm_estimate"),
            (F.min("c") - F.max("exact_n")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), F.asc("term"))
    )


# ---------------------------------------------------------------------
# Bloom-filter membership probe
# ---------------------------------------------------------------------

_BLOOM_SEEDS = (11, 12, 13)
_BLOOM_BITS_HEX = 2  # bit positions in [0, 256)


def _bitpos_sql(key_sql: str, seed: int) -> str:
    return hex_prefix_int_sql(f"md5('{seed}:' || {key_sql})", _BLOOM_BITS_HEX)


_BLOOM_ORACLE = f"""
WITH block AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0
),
bits AS (
  SELECT DISTINCT seed, bit FROM (
    {' UNION ALL '.join(
        f"SELECT {s} AS seed, {_bitpos_sql('CAST(user_id AS VARCHAR)', s)} AS bit FROM block"
        for s in _BLOOM_SEEDS
    )}
  )
),
users AS (SELECT DISTINCT user_id FROM events),
probes AS (
  {' UNION ALL '.join(
      f"SELECT user_id, {s} AS seed, {_bitpos_sql('CAST(user_id AS VARCHAR)', s)} AS bit FROM users"
      for s in _BLOOM_SEEDS
  )}
),
hits AS (
  SELECT p.user_id, count(*) AS nbits
  FROM probes p JOIN bits b ON b.seed = p.seed AND b.bit = p.bit
  GROUP BY p.user_id
),
flagged AS (SELECT user_id FROM hits WHERE nbits = {len(_BLOOM_SEEDS)})
SELECT CAST(count(*) AS BIGINT) AS n_flagged,
       CAST(coalesce(sum(CASE WHEN user_id % 13 = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true_members,
       CAST(coalesce(sum(CASE WHEN user_id % 13 <> 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_false_positives
FROM flagged
"""


@register(
    "bloom_membership_probe",
    oracle=_BLOOM_ORACLE,
    doc="Bloom-filter membership: a 256-bit filter (3 seeded md5 bit "
    "positions) built from a blocklist of users, probed by the full "
    "user set; reports flagged / true-member / false-positive "
    "counts, making the Bloom FP semantics a tested, visible "
    "quantity. Scale contract: the filter is O(m) bits regardless "
    "of blocklist size and the probe is a broadcast equi-join on "
    "(seed, bit) + a count==d filter — the probe side (billions of "
    "rows at 100 TB) never shuffles and never joins the raw "
    "blocklist. This is the decontamination / denylist pattern "
    "when the exact-join variant (decontaminate_ngram_overlap) is "
    "too large to broadcast raw.",
    tags=("sketch", "membership", "join"),
)
def bloom_membership_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    users = ev.select("user_id").distinct()
    block = users.filter(F.col("user_id") % 13 == 0)
    seeds = F.array(*[F.lit(s) for s in _BLOOM_SEEDS])

    def bitpos(df: DataFrame) -> DataFrame:
        return df.select(
            "user_id", F.explode(seeds).alias("seed")
        ).withColumn(
            "h",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("user_id").cast("string"))),
        ).withColumn("bit", F.expr(hex_prefix_int_sql("h", _BLOOM_BITS_HEX))).select(
            "user_id", "seed", "bit"
        )

    bits = bitpos(block).select("seed", "bit").distinct()
    probes = bitpos(users)
    flagged = (
        probes.join(F.broadcast(bits), ["seed", "bit"], "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("nbits"))
        .filter(F.col("nbits") == len(_BLOOM_SEEDS))
    )
    return flagged.agg(
        F.count("*").cast("long").alias("n_flagged"),
        F.coalesce(
            F.sum(F.when(F.col("user_id") % 13 == 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_true_members"),
        F.coalesce(
            F.sum(F.when(F.col("user_id") % 13 != 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_false_positives"),
    )


# ---------------------------------------------------------------------
# Histogram quantile estimation (mergeable-bin quantile sketch)
# ---------------------------------------------------------------------

_NBINS = 128

_HISTQ_ORACLE = f"""
WITH bounds AS (
  SELECT min(value) AS lo, max(value) AS hi, CAST(count(*) AS BIGINT) AS n FROM events
),
binned AS (
  SELECT least(CAST(floor((value - lo) / ((hi - lo) / {_NBINS})) AS BIGINT), {_NBINS - 1}) AS bin
  FROM events, bounds
),
hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY bin),
cum AS (
  SELECT bin, c, CAST(sum(c) OVER (ORDER BY bin) AS BIGINT) AS cum
  FROM hist
),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
targets AS (
  SELECT q, CAST(ceil(q * n) AS BIGINT) AS target, lo, hi, n FROM qs, bounds
),
est AS (
  SELECT t.q,
         min(c2.bin) AS hit_bin,
         t.lo, t.hi, t.target
  FROM targets t JOIN cum c2 ON c2.cum >= t.target
  GROUP BY t.q, t.lo, t.hi, t.target
),
exact AS (
  SELECT q2.q AS q, min(v.value) AS exact_value
  FROM (
    SELECT value, row_number() OVER (ORDER BY value ASC, event_id ASC) AS rn
    FROM events
  ) v
  JOIN targets q2 ON v.rn = q2.target
  GROUP BY q2.q
)
SELECT e.q,
       round(x.exact_value, 6) AS exact_value,
       round(e.lo + (e.hit_bin + 1) * ((e.hi - e.lo) / {_NBINS}), 6) AS est_upper_edge,
       round(e.lo + (e.hit_bin + 1) * ((e.hi - e.lo) / {_NBINS}) - x.exact_value, 6) AS est_error
FROM est e JOIN exact x ON x.q = e.q
ORDER BY e.q
"""


@register(
    "histogram_quantile_estimate",
    oracle=_HISTQ_ORACLE,
    doc="Mergeable-histogram quantile sketch: 128 fixed-width bins "
    "over the exact [min, max] envelope, nearest-rank p50/p90/p99 "
    "estimated as the upper edge of the bin where the cumulative "
    "count crosses the target rank, reported against the exact "
    "nearest-rank value with the signed error. Scale contract: bin "
    "counts merge associatively (map-side combine, 128 longs per "
    "partition) where the exact path needs a full sort of the "
    "value column — the estimate costs two scans (bounds + bins) "
    "at any data size; error is bounded by one bin width. "
    "Complements event_value_percentiles (exact nearest-rank) the "
    "way approx_percentile complements percentile in production.",
    tags=("sketch", "quantile", "agg"),
)
def histogram_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / _NBINS
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            F.lit(_NBINS - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    cum = hist.select(
        "bin",
        F.sum("c")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    qs = bounds.select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q"),
        "lo",
        "hi",
        "n",
    ).select("q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("target"), "lo", "hi")
    est = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("q", "lo", "hi", "target")
        .agg(F.min("bin").alias("hit_bin"))
    )
    ranked = ev.select(
        "value",
        F.row_number()
        .over(Window.orderBy(F.asc("value"), F.asc("event_id")))
        .alias("rn"),
    )
    exact = ranked.join(
        qs.select(F.col("q").alias("q2"), "target"), F.col("rn") == F.col("target")
    ).groupBy(F.col("q2").alias("q")).agg(F.min("value").alias("exact_value"))
    edge = F.col("lo") + (F.col("hit_bin") + 1) * ((F.col("hi") - F.col("lo")) / _NBINS)
    return (
        est.join(exact, "q")
        .select(
            "q",
            F.round(F.col("exact_value"), 6).alias("exact_value"),
            F.round(edge, 6).alias("est_upper_edge"),
            F.round(edge - F.col("exact_value"), 6).alias("est_error"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------
# KMV set-operation estimation (theta-sketch-style intersection)
# ---------------------------------------------------------------------

_KI_K = 64


def _kmv_cte(event_type: str, name: str) -> str:
    return f"""{name}_fr AS (
  SELECT DISTINCT {hex_frac_sql("md5(CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d'))")} AS f
  FROM events WHERE event_type = '{event_type}'
),
{name} AS (
  SELECT f FROM (
    SELECT f, row_number() OVER (ORDER BY f) AS rn FROM {name}_fr
  ) WHERE rn <= {_KI_K}
)"""


_KMV_INTERSECT_ORACLE = f"""
WITH {_kmv_cte('click', 'ka')},
{_kmv_cte('view', 'kb')},
uni AS (
  SELECT f FROM (
    SELECT f, row_number() OVER (ORDER BY f) AS rn
    FROM (SELECT f FROM ka UNION SELECT f FROM kb)
  ) WHERE rn <= {_KI_K}
),
uni_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, max(f) AS fk FROM uni
),
common AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common
  FROM uni WHERE f IN (SELECT f FROM ka) AND f IN (SELECT f FROM kb)
),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
    SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d FROM events WHERE event_type = 'view'
  )
)
SELECT exact.exact_intersection,
       round(CASE WHEN u.n < {_KI_K} THEN CAST(u.n AS DOUBLE) ELSE {_KI_K - 1}.0 / u.fk END, 4) AS union_estimate,
       round(CAST(c.n_common AS DOUBLE) / u.n, 6) AS jaccard_estimate,
       round((CAST(c.n_common AS DOUBLE) / u.n)
             * (CASE WHEN u.n < {_KI_K} THEN CAST(u.n AS DOUBLE) ELSE {_KI_K - 1}.0 / u.fk END), 4) AS intersection_estimate
FROM exact, uni_stats u, common c
"""


@register(
    "kmv_set_intersection_estimate",
    oracle=_KMV_INTERSECT_ORACLE,
    doc="Theta-sketch-style set-operation algebra on KMV sketches: "
    "estimate |clickers INTERSECT viewers| over (user, day) activity "
    "keys from two k=64 sketches alone — union sketch = min-k of "
    "the merged minima, Jaccard = fraction of the union's k minima "
    "present in BOTH input sketches, intersection = Jaccard x "
    "union-size estimate — reported against the exact intersection. "
    "Scale contract: the estimate touches only 3k hash fractions "
    "however large the event stream; the exact INTERSECT needs a "
    "full distinct-shuffle of both sides. The membership tests are "
    "broadcast semi-joins against 64-row sketches.",
    tags=("sketch", "distinct", "set-ops"),
)
def kmv_set_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]

    def sketch(etype: str) -> DataFrame:
        fr = (
            ev.filter(F.col("event_type") == etype)
            .select(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("@"),
                        F.date_format("ts", "yyyy-MM-dd"),
                    )
                ).alias("h")
            )
            .distinct()
            .select(F.expr(hex_frac_sql("h")).alias("f"))
        )
        return (
            fr.withColumn("rn", F.row_number().over(Window.orderBy("f")))
            .filter(F.col("rn") <= _KI_K)
            .select("f")
        )

    ka = sketch("click").cache()
    kb = sketch("view").cache()
    uni = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("f")))
        .filter(F.col("rn") <= _KI_K)
        .select("f")
        .cache()
    )
    uni_stats = uni.agg(F.count("*").alias("n"), F.max("f").alias("fk"))
    common = (
        uni.join(F.broadcast(ka), "f", "left_semi")
        .join(F.broadcast(kb), "f", "left_semi")
        .agg(F.count("*").alias("n_common"))
    )
    key = F.concat(
        F.col("user_id").cast("string"), F.lit("@"), F.date_format("ts", "yyyy-MM-dd")
    )
    clickers = ev.filter(F.col("event_type") == "click").select(key.alias("k")).distinct()
    viewers = ev.filter(F.col("event_type") == "view").select(key.alias("k")).distinct()
    exact = (
        clickers.join(viewers, "k", "left_semi")
        .agg(F.count("*").alias("exact_intersection"))
    )
    union_est = F.when(F.col("n") < _KI_K, F.col("n").cast("double")).otherwise(
        F.lit(float(_KI_K - 1)) / F.col("fk")
    )
    return (
        exact.crossJoin(F.broadcast(uni_stats))
        .crossJoin(F.broadcast(common))
        .select(
            F.col("exact_intersection").cast("long").alias("exact_intersection"),
            F.round(union_est, 4).alias("union_estimate"),
            F.round(F.col("n_common").cast("double") / F.col("n"), 6).alias(
                "jaccard_estimate"
            ),
            F.round(
                (F.col("n_common").cast("double") / F.col("n")) * union_est, 4
            ).alias("intersection_estimate"),
        )
    )
