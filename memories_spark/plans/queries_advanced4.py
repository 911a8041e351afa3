"""Advanced analytics batch 8: interval-union coverage, series
autocorrelation, CUSUM change points, burst detection, blocked exact
set-similarity join, bigram LM surprisal, inverted-index postings,
and sequence-pattern matching.

Determinism contract as per the registry module docstring: BIGINT
until the last division, fixed-point 1e12 for transcendentals,
explicit tie-breaks, formatted timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import bounded_seq, tokens_expr, tokens_sql
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Interval-union coverage (merged busy time per user)
# ---------------------------------------------------------------------

_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + (abs(CAST(round(value * 100.0) AS BIGINT)) % 1741) + 60 AS end_s
  FROM events
),
flagged AS (
  SELECT user_id, event_id, start_s, end_s,
         CASE WHEN max(end_s) OVER (
                PARTITION BY user_id ORDER BY start_s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start_s > max(end_s) OVER (
                PARTITION BY user_id ORDER BY start_s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  -- same (start_s, event_id) ordering as the flag window: a different
  -- tie-break here would detach tied-start rows from their island
  SELECT user_id, start_s, end_s,
         sum(new_island) OVER (
           PARTITION BY user_id ORDER BY start_s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island_id
  FROM flagged
),
per_island AS (
  SELECT user_id, island_id,
         max(end_s) - min(start_s) AS covered
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(covered) AS BIGINT) AS covered_seconds
FROM per_island
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "interval_coverage_union",
    bench=True,
    oracle=_COVERAGE_ORACLE,
    doc="Merged interval-union coverage per user (the classic 'total "
    "busy time' sweep): each event opens an interval of "
    "value-derived length; overlapping intervals merge into "
    "islands, and we report island count and total covered "
    "seconds. Plan: ONE shuffle on user_id serves both window "
    "passes (running-max-of-end flags island starts, cumulative "
    "sum numbers them) and the final aggregation — the sweep is "
    "O(n log n) per user with no self-join, vs the naive "
    "interval-overlap join that is quadratic per user. At 100 TB "
    "the per-user partitioning is the same one sessionization "
    "uses, so the operator composes with it for free.",
    tags=("temporal", "windows"),
)
def interval_coverage_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    start = F.unix_timestamp("ts")
    dur = (F.abs(F.round(F.col("value") * 100.0).cast("long")) % 1741) + 60
    iv = ev.select(
        "user_id",
        "event_id",
        start.alias("start_s"),
        (start + dur).alias("end_s"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("end_s").over(w_prev)
    flagged = iv.select(
        "user_id",
        "event_id",
        "start_s",
        "end_s",
        F.when(prev_max.isNull() | (F.col("start_s") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    # identical ordering to the flag window — a different tie-break
    # would detach tied-start rows from their island
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "start_s",
        "end_s",
        F.sum("new_island").over(w_cum).alias("island_id"),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        (F.max("end_s") - F.min("start_s")).alias("covered")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum("covered").alias("covered_seconds"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------
# Autocorrelation of the hourly event-count series
# ---------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 6, 12, 24)

_ACF_ORACLE = f"""
WITH hrs AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h FROM events
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hrs),
spine AS (
  SELECT unnest(generate_series(lo, hi)) AS h FROM bounds
),
c AS (SELECT h, count(*) AS n FROM hrs GROUP BY h),
series AS (
  SELECT s.h, COALESCE(c.n, 0) AS n FROM spine s LEFT JOIN c ON s.h = c.h
),
lags AS (SELECT unnest([{", ".join(str(lag) for lag in _ACF_LAGS)}]) AS lag),
pairs AS (
  SELECT l.lag, a.n AS x, b.n AS y
  FROM lags l
  JOIN series a ON TRUE
  JOIN series b ON b.h = a.h + l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT lag, n AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
FROM m
ORDER BY lag
"""


@register(
    "hourly_acf",
    oracle=_ACF_ORACLE,
    doc="Autocorrelation of the global hourly event-count series at "
    "lags 1/2/3/6/12/24 — the periodicity diagnostic behind "
    "seasonality_dow_index. The series is densified over an hour "
    "spine (missing hours count as zero, so the ACF is "
    "well-defined), lag pairs come from a broadcast 6-row lag "
    "table joined against the tiny per-hour rollup (never the raw "
    "events), and Pearson is assembled from exact BIGINT moment "
    "sums — order-independent across engines and partitionings. "
    "At scale the raw table is touched once (one groupBy h); "
    "everything after operates on ~hours rows.",
    tags=("temporal", "stats"),
)
def hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    hrs = ev.select((F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"))
    c = hrs.groupBy("h").agg(F.count("*").alias("n"))
    # Bounds come from the per-hour rollup, not a second raw scan:
    # the fact table is touched exactly once at any scale.
    bounds = c.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("h")
    )
    series = (
        spine.join(c, "h", "left")
        .select("h", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    lags = spark.createDataFrame([(lag,) for lag in _ACF_LAGS], "lag bigint")
    a = series.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("h") + F.col("lag")).alias("bh"), F.col("n").alias("x")
    )
    b = series.select(F.col("h").alias("bh"), F.col("n").alias("y"))
    pairs = a.join(b, "bh")
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        m.select(
            "lag",
            F.col("n").alias("n_pairs"),
            F.round(num / den, 6).alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------
# CUSUM change-point per event type (integer-exact)
# ---------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
t AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS days,
         CAST(sum(n) AS BIGINT) AS total
  FROM d GROUP BY event_type
),
c AS (
  SELECT d.event_type, d.day, t.days, t.total,
         CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS k,
         CAST(sum(d.n) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM d JOIN t ON d.event_type = t.event_type
),
s AS (
  SELECT event_type, day, days * cum - k * total AS scaled,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY abs(days * cum - k * total) DESC, day ASC) AS rk
  FROM c
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS change_day,
       CAST(scaled AS BIGINT) AS cusum_scaled,
       CAST(CASE WHEN scaled > 0 THEN 1 WHEN scaled < 0 THEN -1 ELSE 0 END AS BIGINT)
         AS direction
FROM s WHERE rk = 1
ORDER BY event_type
"""


@register(
    "cusum_changepoint",
    oracle=_CUSUM_ORACLE,
    doc="CUSUM change-point detection on the per-type daily count "
    "series: the day k maximizing |cumsum_k - k*mean| marks the "
    "most likely level shift. Kept integer-exact by scaling "
    "through the day count (days*cum - k*total) so no float mean "
    "ever enters the comparison — bitwise identical across "
    "engines and partition orders. Plan: one groupBy collapses "
    "the fact table to ~types x days rows; the join against the "
    "5-row per-type totals broadcasts; both windows and the final "
    "rank share the single event_type shuffle.",
    tags=("temporal", "stats"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    t = d.groupBy("event_type").agg(
        F.count("*").alias("days"), F.sum("n").alias("total")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    c = d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "day",
        "days",
        "total",
        F.row_number().over(w_ord).cast("long").alias("k"),
        F.sum("n")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    scaled = F.col("days") * F.col("cum") - F.col("k") * F.col("total")
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(scaled).desc(), F.col("day").asc()
    )
    s = c.select(
        "event_type",
        "day",
        scaled.alias("scaled"),
        F.row_number().over(w_rank).alias("rk"),
    )
    return (
        s.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.col("scaled").alias("cusum_scaled"),
            F.when(F.col("scaled") > 0, 1)
            .when(F.col("scaled") < 0, -1)
            .otherwise(0)
            .cast("long")
            .alias("direction"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Burst detection vs a trailing 24-hour baseline
# ---------------------------------------------------------------------

_BURST_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600
),
w AS (
  SELECT event_type, h, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY h
                      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trailing_n
  FROM c
)
SELECT event_type,
       strftime(make_timestamp(h * 3600 * 1000000), '%Y-%m-%d %H:%M:%S') AS hour,
       n, CAST(trailing_n AS BIGINT) AS trailing_n,
       round(CAST(n * 24 AS DOUBLE) / trailing_n, 4) AS burst_ratio
FROM w
WHERE trailing_n IS NOT NULL AND trailing_n >= 24
  AND n * 24 >= 2 * trailing_n AND n >= 8
ORDER BY event_type, hour
"""


@register(
    "hourly_burst_detection",
    oracle=_BURST_ORACLE,
    doc="Burst detection: hours where a type's count is at least 2x "
    "its trailing 24-hour average (and above absolute floors, so "
    "quiet types don't alert on noise). The burst predicate is "
    "evaluated in integers (n*24 >= 2*trailing) — the float ratio "
    "is display-only. Plan: the fact table collapses to types x "
    "hours in one groupBy; the trailing baseline is a RANGE "
    "window over the integer hour index on that small rollup, so "
    "gaps in the series shorten the baseline correctly without "
    "densification. One shuffle total at any scale.",
    tags=("temporal", "monitoring"),
)
def hourly_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.groupBy(
        "event_type",
        (F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"),
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rangeBetween(-24, -1)
    )
    flagged = c.select(
        "event_type",
        "h",
        "n",
        F.sum("n").over(w).alias("trailing_n"),
    )
    return (
        flagged.filter(
            F.col("trailing_n").isNotNull()
            & (F.col("trailing_n") >= 24)
            & (F.col("n") * 24 >= 2 * F.col("trailing_n"))
            & (F.col("n") >= 8)
        )
        .select(
            "event_type",
            F.date_format(
                F.timestamp_seconds(F.col("h") * 3600), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "n",
            "trailing_n",
            F.round(
                (F.col("n") * 24).cast("double") / F.col("trailing_n"), 4
            ).alias("burst_ratio"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------
# Blocked exact set-similarity join (rare-shingle candidate pruning)
# ---------------------------------------------------------------------

_SETSIM_ORACLE = f"""
WITH toked AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS s
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                 i -> array_to_string(toks[i:i+2], ' '))) AS s
    FROM toked
  )
),
f AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
rare AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN f ON sh.s = f.s
  WHERE f.df BETWEEN 2 AND 8
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter_sz
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, i.inter_sz,
       sa.sz + sb.sz - i.inter_sz AS union_sz,
       round(CAST(i.inter_sz AS DOUBLE) / (sa.sz + sb.sz - i.inter_sz), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.inter_sz AS DOUBLE) / (sa.sz + sb.sz - i.inter_sz) >= 0.25
ORDER BY jaccard DESC, doc_a, doc_b
"""


@register(
    "rareterm_jaccard_join",
    bench=True,
    oracle=_SETSIM_ORACLE,
    doc="Exact set-similarity self-join over 3-word shingle sets with "
    "rare-shingle blocking (the prefix-filter idea from "
    "PPJoin/AllPairs): only document pairs sharing at least one "
    "discriminative shingle (2 <= df <= 8) become candidates, then "
    "exact Jaccard is verified on the full sets and pairs >= 0.25 "
    "survive. Complements minhash_near_dups (probabilistic) and "
    "ngram_jaccard_pairs with an EXACT result whose candidate "
    "generation still avoids the quadratic all-pairs join: the "
    "blocking join fans out only on rare shingles, so candidate "
    "volume scales with sum(df^2 | df small), not n^2. The df "
    "cap also bounds per-key skew in the self-join. Shingles are "
    "carried as 60-bit md5-prefix hashes, not strings: the df "
    "groupBy, blocking self-join and intersection join all shuffle "
    "8-byte longs instead of ~25-byte strings (~15%% faster here, "
    "and the dominant shuffle-volume term at 100 TB); the oracle "
    "hashes IDENTICALLY (same md5 prefix), so parity is exact by "
    "construction even in the (2^-60-scale) collision case.",
    tags=("dedup", "text", "training"),
)
def rareterm_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", tokens_expr("text").alias("toks"))
    idx = bounded_seq(F.size("toks") - 2)
    shingle_strs = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice("toks", i, 3))
    )
    # One row per doc with its distinct shingle-hash SET as an array
    # (distinct AFTER hashing, like the oracle, so per-doc set sizes
    # agree cross-engine by construction). This is the table the whole
    # query derives from: df counts and blocking explode it; the exact
    # verify consumes the arrays directly — at 100 TB this is the
    # materialized sketch table a production similarity join would
    # write out.
    arr = (
        toked.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    shingle_strs,
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
                    .cast("long"),
                )
            ).alias("arr"),
        )
        .persist()
    )
    # exploded (doc, shingle) rows feed df counts and both sides of
    # the blocking self-join; persisting skips the 3x re-explode
    sh = arr.select("doc_id", F.explode("arr").alias("s")).persist()
    f = sh.groupBy("s").agg(F.count("*").alias("df"))
    rare = sh.join(
        f.filter((F.col("df") >= 2) & (F.col("df") <= 8)).select("s"), "s"
    )
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # Exact verify on the pair table: attach each side's shingle-set
    # array and intersect in-row (hash-set intersection, no fan-out).
    # The former shape exploded every candidate pair by |shingles(a)|
    # rows through two joins and re-aggregated (~66M intermediate rows
    # at sf0.1 for 190k pairs) plus two more per-doc size aggregations
    # and their joins; the arrays carry both the intersection and the
    # set sizes in one pass over the pairs (guide §2.3/§2.4 — fewer
    # shuffles, decision data moved once).
    # NOTE: arr is a per-document table — at 100x corpus a broadcast
    # here OOMs. No hint: AQE picks the strategy (the candidate-pair
    # side is the small one after blocking).
    # The pair table is a few MB, so AQE coalesces the post-distinct
    # stage to ~1 partition — but each pair row costs an O(|set|)
    # intersection downstream (the per-row work is ~1000x the shuffle
    # bytes), so the verify must run at cluster width. Round-robin on
    # purpose: a hash repartition on (doc_a, doc_b) is collapsed as
    # redundant with the distinct's partitioning and the surviving
    # ENSURE_REQUIREMENTS exchange gets size-coalesced to ~1
    # partition; REPARTITION_BY_NUM is exempt from AQE coalescing
    # (guide §2.5: bytes-based sizing misjudges compute-heavy rows).
    cand = cand.repartition(spark.sparkContext.defaultParallelism)
    a = arr.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    b = arr.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    paired = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b"))
            .cast("long")
            .alias("inter_sz"),
            F.size("arr_a").cast("long").alias("sza"),
            F.size("arr_b").cast("long").alias("szb"),
        )
    )
    union_sz = F.col("sza") + F.col("szb") - F.col("inter_sz")
    jac = F.col("inter_sz").cast("double") / union_sz
    survivors = (
        paired.filter((F.col("inter_sz") > 0) & (jac >= 0.25))
        .select(
            "doc_a",
            "doc_b",
            "inter_sz",
            union_sz.alias("union_sz"),
            F.round(jac, 6).alias("jaccard"),
        )
        # The global sort below range-partitions, and the range
        # partitioner SAMPLES its child first — an unmaterialized
        # child would run the whole verify twice. The surviving pairs
        # are tiny; the lazy checkpoint computes them once inside the
        # final job and the sample pass reads the persisted rows.
        .localCheckpoint(eager=False)
    )
    return survivors.orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")


# ---------------------------------------------------------------------
# Bigram language-model surprisal (perplexity-proxy, order 2)
# ---------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH toked AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
uni AS (
  SELECT t AS w, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(toks) AS t FROM toked) GROUP BY t
),
v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS b
  FROM toked, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i)
),
c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS n2 FROM bg GROUP BY b),
scored AS (
  SELECT bg.doc_id,
         CAST(round(ln(CAST(uni.c1 + v.vocab AS DOUBLE)
                       / CAST(c2.n2 + 1 AS DOUBLE)) * 1e12) AS BIGINT) AS nll_fp
  FROM bg JOIN c2 ON bg.b = c2.b JOIN uni ON bg.w1 = uni.w, v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(nll_fp) AS DOUBLE) / 1e12 / count(*), 6) AS surprisal
FROM scored
GROUP BY doc_id
ORDER BY surprisal DESC, doc_id ASC
LIMIT 20
"""


@register(
    "bigram_surprisal_score",
    oracle=_BIGRAM_ORACLE,
    doc="Order-2 language-model quality scoring: mean negative log "
    "probability of each document's bigrams under the corpus's own "
    "add-one-smoothed bigram LM, P(w2|w1) = (c(w1 w2)+1) / "
    "(c(w1)+V). The order-2 twin of unigram_surprisal_score — "
    "documents whose word ORDER is unusual score high even when "
    "their vocabulary is typical, which is exactly the boilerplate "
    "/ shuffled-text signal unigram models miss. Per-bigram NLL "
    "terms are fixed-point BIGINTs so the per-doc mean is "
    "order-independent. Plan: bigram explosion feeds one groupBy "
    "for the LM counts; rescoring joins the instance stream to "
    "the (much smaller) count tables; vocab is a broadcast "
    "scalar. Top-20 via TakeOrderedAndProject.",
    tags=("text", "quality", "training"),
)
def bigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", tokens_expr("text").alias("toks"))
    uni = (
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("vocab"))
    idx = bounded_seq(F.size("toks") - 1)
    bg = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                    ).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.b").alias("b"))
    c2 = bg.groupBy("b").agg(F.count("*").alias("n2"))
    scored = (
        bg.join(c2, "b")
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("c1") + F.col("vocab")).cast("double")
                    / (F.col("n2") + 1).cast("double")
                )
                * F.lit(1e12)
            )
            .cast("long")
            .alias("nll_fp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum("nll_fp").cast("double") / F.lit(1e12) / F.count("*"), 6
            ).alias("surprisal"),
        )
        .orderBy(F.col("surprisal").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------
# Inverted-index postings (discriminative shingles)
# ---------------------------------------------------------------------

_POSTINGS_ORACLE = f"""
WITH toked AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                               i -> array_to_string(toks[i:i+2], ' '))) AS s
  FROM toked
),
f AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s)
SELECT f.s AS shingle, f.df,
       string_agg(CAST(sh.doc_id AS VARCHAR), ',' ORDER BY sh.doc_id)
         AS postings
FROM f JOIN sh ON f.s = sh.s
WHERE f.df BETWEEN 4 AND 8
GROUP BY f.s, f.df
ORDER BY f.s
"""


@register(
    "inverted_index_postings",
    oracle=_POSTINGS_ORACLE,
    doc="Inverted-index construction for the discriminative middle of "
    "the df spectrum (4 <= df <= 8): per 3-word shingle, the "
    "sorted posting list of documents containing it — the "
    "materialized index that would back phrase search over the "
    "corpus (reference backs BM25 with exactly this shape per "
    "term, memory_engine.py term stats). Postings are "
    "sort_array'd inside the row so output is deterministic "
    "without a global sort of the posting stream. Plan: one "
    "explode + one groupBy; the df filter prunes both the "
    "stop-shingle skew (df cap) and the singleton long tail "
    "(df floor) before any list is materialized.",
    tags=("text", "retrieval"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", tokens_expr("text").alias("toks"))
    idx = bounded_seq(F.size("toks") - 2)
    sh = toked.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.concat_ws(" ", F.slice("toks", i, 3))
                )
            )
        ).alias("s"),
    )
    agg = sh.groupBy("s").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return (
        agg.filter((F.col("df") >= 4) & (F.col("df") <= 8))
        .select(F.col("s").alias("shingle"), "df", "postings")
        .orderBy("shingle")
    )


# ---------------------------------------------------------------------
# Sequence-pattern matching over per-user event strings
# ---------------------------------------------------------------------

_SEQPAT_ORACLE = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS seq_len,
       CAST(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END AS BIGINT)
         AS has_funnel,
       CAST((length(seq) - length(replace(seq, 'vc', ''))) // 2 AS BIGINT)
         AS vc_adjacent
FROM seqs
ORDER BY user_id
"""


@register(
    "user_sequence_pattern",
    oracle=_SEQPAT_ORACLE,
    doc="Sequence-pattern matching (the MATCH_RECOGNIZE shape): each "
    "user's event history is collapsed to an ordered initial "
    "string (v/c/p/s/e) and regular-expression predicates run "
    "over it — subsequence funnel v.*c.*p, and the count of "
    "immediately-adjacent view->click transitions via the "
    "replace-length trick. The ordered collapse is "
    "collect_list(struct(ts, id, letter)) + array_sort inside the "
    "aggregation — no per-user window sort pass, ONE shuffle on "
    "user_id, and the regex runs once per user on a tiny string, "
    "not once per event. State per user is bounded by their "
    "event count, the same bound sessionization already accepts.",
    tags=("temporal", "funnel"),
)
def user_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    rows = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").alias("eid"),
            F.substring("event_type", 1, 1).alias("letter"),
        ).alias("e"),
    )
    seqs = rows.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("e")), lambda e: e["letter"]
            ),
            "",
        ).alias("seq")
    )
    return (
        seqs.select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            F.when(F.col("seq").rlike("v.*c.*p"), 1)
            .otherwise(0)
            .cast("long")
            .alias("has_funnel"),
            (
                (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit("vc"), F.lit(""))))
                / 2
            )
            .cast("long")
            .alias("vc_adjacent"),
        )
        .orderBy("user_id")
    )


def rareterm_work_stats(spark: SparkSession, sf_dir: str) -> dict:
    """Self-labeling work volume for the bench JSON (round-5 verdict
    bench-hygiene item): rareterm_jaccard_join is the slowest bench
    query BECAUSE it verifies exact Jaccard over every blocked
    candidate pair — without the candidate count in the bench record,
    a corpus shift that doubles candidate volume reads as a code
    regression. Reports the blocked candidate-pair count and the
    corpus size so the cost is attributable to verified-work volume.
    Runs only the blocking prefix of the plan (tokenize + shingle +
    df + blocking join), not the exact-verify stage."""
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", tokens_expr("text").alias("toks"))
    idx = bounded_seq(F.size("toks") - 2)
    shingle_strs = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice("toks", i, 3))
    )
    sh = toked.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    shingle_strs,
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
                    .cast("long"),
                )
            )
        ).alias("s"),
    )
    f = sh.groupBy("s").agg(F.count("*").alias("df"))
    rare = sh.join(
        f.filter((F.col("df") >= 2) & (F.col("df") <= 8)).select("s"), "s"
    )
    n_cand = (
        rare.alias("a")
        .join(rare.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    return {
        "rareterm_jaccard_candidate_pairs": int(n_cand),
        "rareterm_jaccard_docs": int(docs.count()),
    }
