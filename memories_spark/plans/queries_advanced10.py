"""Advanced analytics batch 14: collaborative-filtering item
similarity, deterministic dataset split assignment, and curriculum
difficulty buckets.

Determinism contract as per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.topk import global_rank, ntile_from_rank
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Item-item cosine similarity (collaborative filtering)
# ---------------------------------------------------------------------

#: Pair-aggregation width multiplier (x defaultParallelism): unique-ish
#: co-purchase pairs make hash-agg state ~48 B per INPUT row, so tasks
#: must be sized by keys, not bytes (see item_item_cosine). 8x keeps
#: per-task maps ~tens of MB at sf1-like densities; scales with the
#: cluster because it multiplies defaultParallelism.
_PAIR_AGG_FACTOR = 8

_CF_ORACLE = """
WITH raw AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
bought AS (
  SELECT c, p FROM (
    SELECT c, p, row_number() OVER (PARTITION BY c ORDER BY p) AS rn
    FROM raw
  ) WHERE rn <= 100
),
deg AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM bought GROUP BY p),
co AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_both
  FROM bought a JOIN bought b ON a.c = b.c AND a.p < b.p
  GROUP BY a.p, b.p
)
SELECT co.part_a, co.part_b, co.n_both,
       da.n AS n_a, db.n AS n_b,
       round(CAST(co.n_both AS DOUBLE)
             / sqrt(CAST(da.n * db.n AS DOUBLE)), 6) AS cosine
FROM co JOIN deg da ON da.p = co.part_a JOIN deg db ON db.p = co.part_b
WHERE co.n_both >= 3
ORDER BY cosine DESC, part_a ASC, part_b ASC
LIMIT 20
"""


@register(
    "item_item_cosine",
    bench=True,
    oracle=_CF_ORACLE,
    doc="Item-item collaborative filtering: cosine similarity between "
    "parts over binary customer-purchase vectors, n_both / "
    "sqrt(n_a * n_b) — the classical neighborhood-method "
    "recommender primitive (the 'customers who bought X also "
    "bought Y' table). The incidence list is first collapsed to "
    "DISTINCT (customer, part), then each customer's basket is "
    "capped at 100 parts (deterministic: lowest partkeys win), so "
    "the self-join fan-out is bounded at 100*99/2 pairs per "
    "customer — a power user with a 10^4-item basket contributes "
    "~5k pairs instead of 10^8 (the skew scale-killer the cap "
    "removes, mirroring supplier_copart_projection's hub bound); "
    "degree counts join back onto the (much smaller) pair "
    "table; n_both >= 3 prunes noise pairs before the sqrt. "
    "Top-20 via TakeOrderedAndProject. The cosine divides two "
    "exact BIGINTs, so cross-engine equality is exact.",
    tags=("similarity", "product", "join"),
)
def item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # ONE shuffle feeds the whole basket build: hash-partitioning by c
    # alone satisfies the dedup's (c, p) clustering requirement (subset
    # rule), the cap window's and the basket groupBy's — distinct() on
    # (c, p) would shuffle on the pair key and force the window to
    # re-shuffle by c right after (guide §2.1: remove shuffles the
    # partitioning already covers). Trade-off: the repartition ships
    # raw (c, p) pairs before dedup, so repeat purchases travel — on
    # order-line data duplicates are rare; flip back to distinct-first
    # if a corpus has heavy repeat-purchase fan-in.
    raw = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            t["lineitem"]["l_orderkey"] == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .repartition("c")
        .dropDuplicates(["c", "p"])
    )
    # Basket cap: bound the per-customer pair fan-out to 100*99/2
    # pairs regardless of how large a hub customer's basket is. The
    # window's WindowGroupLimit pre-filters to <=100 rows per customer
    # map-side before the shuffle (a groupBy+collect_list alone has no
    # such partial bound, so a hub customer would ship its whole
    # basket).
    cap_w = Window.partitionBy("c").orderBy(F.col("p").asc())
    bought = (
        raw.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )
    # Collapse each capped basket to ONE row holding its sorted part
    # array: the window left the data partitioned by c, so this
    # groupBy adds no exchange, and co-purchase pairs are then
    # enumerated map-side from each array (i<j over a sorted array ==
    # the p < part_b self-join) — the former self-join re-shuffled the
    # persisted incidence list twice and sort-merge-joined it
    # (guide §2.4: remove shuffles outright). Persisted: degrees and
    # pair generation both consume it — the materialized basket table
    # a production CF pipeline would checkpoint.
    baskets = (
        bought.groupBy("c")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .persist()
    )
    deg = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("n"))
    )
    # Pair enumeration as two stacked generators (posexplode, then
    # explode of a slice): i<j over the sorted array == the p < part_b
    # self-join, exactly as before, but slice/size/explode all run
    # under whole-stage codegen. The previous shape built each
    # basket's full pair list through nested higher-order functions
    # (transform-in-transform + struct + flatten), and HOF lambdas are
    # evaluated INTERPRETED — at ~C(100,2) struct allocations per hub
    # basket the interpreted eval dominated the whole query (guide
    # §1.2 "per-task work": measured 3-7x slower than the generator
    # form on the same baskets, worse under memory pressure; 115 s
    # outliers at sf1).
    #
    # Both sides of the pair aggregation are widened to a multiple of
    # cluster width (guide §2.5/§5): co-purchase pairs are ~99%
    # unique, so the per-task hash-agg STATE is ~48 bytes per input
    # row — at sf1's 131 M pairs over the basket table's own 32
    # partitions each partial-agg task built a ~200 MB map and fell
    # back to sort+spill (isolated noop: 59-75 s for the aggregation
    # alone). Sizing tasks by AGGREGATION KEYS rather than input
    # bytes (which AQE's advisory size can't see) keeps every map
    # in-memory: measured 59 s -> ~8 s on the same machine. The
    # factor scales with defaultParallelism, not a local constant.
    fanout = baskets.sparkSession.sparkContext.defaultParallelism * _PAIR_AGG_FACTOR
    co = (
        baskets.repartition(fanout)
        .select(F.posexplode("ps").alias("i", "part_a"), "ps")
        .select(
            "part_a",
            F.explode(
                F.slice("ps", F.col("i") + F.lit(2), F.size("ps"))
            ).alias("part_b"),
        )
        .repartition(fanout, "part_a", "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    da = deg.select(F.col("p").alias("part_a"), F.col("n").alias("n_a"))
    db = deg.select(F.col("p").alias("part_b"), F.col("n").alias("n_b"))
    return (
        co.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------
# Deterministic train/val/test split assignment
# ---------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT doc_id, lang, n_chars,
         CASE
           WHEN CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 204 THEN 'train'
           WHEN CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 230 THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT a.split, a.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(a.n_chars) AS BIGINT) AS chars_total,
       round(CAST(count(*) AS DOUBLE) / t.n, 6) AS corpus_share
FROM assigned a, tot t
GROUP BY a.split, a.lang, t.n
ORDER BY a.split, a.lang
"""


@register(
    "dataset_split_assignment",
    oracle=_SPLIT_ORACLE,
    doc="Deterministic train/val/test split (~80/10/10) by hashing the "
    "document id — the split a training pipeline must be able to "
    "recompute identically on any engine, any day, with no stored "
    "assignment table (md5 bucket 0..255: <204 train, <230 val, "
    "else test). Reported per (split, language) with corpus "
    "shares, which doubles as the split-balance audit (a language "
    "skewed into val is a real bug this query exposes). "
    "Hash-assignment is a map-side expression; one groupBy; the "
    "1-row total broadcasts.",
    tags=("training", "sampling"),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")
    assigned = docs.select(
        "lang",
        "n_chars",
        F.when(bucket < 204, "train")
        .when(bucket < 230, "val")
        .otherwise("test")
        .alias("split"),
    )
    tot = docs.agg(F.count("*").alias("n"))
    return (
        assigned.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            "lang",
            "n_docs",
            "chars_total",
            F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias(
                "corpus_share"
            ),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------
# Curriculum difficulty buckets (surprisal quintiles)
# ---------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dict AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
tot AS (SELECT sum(tf) AS n FROM dict),
scored AS (
  SELECT t.doc_id,
         CAST(round(ln(CAST(n AS DOUBLE)/tf) * 1e9) AS BIGINT) AS s_fp
  FROM toks t JOIN dict d ON t.term = d.term CROSS JOIN tot
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(s_fp) AS BIGINT) AS s
  FROM scored GROUP BY doc_id
),
bucketed AS (
  SELECT doc_id, n_tokens, s,
         ntile(5) OVER (ORDER BY s * 1000000 // n_tokens ASC, doc_id ASC)
           AS bucket
  FROM per_doc
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       round(CAST(sum(s) AS DOUBLE) / sum(n_tokens) / 1e9, 6)
         AS avg_surprisal
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "curriculum_difficulty_buckets",
    oracle=_CURRICULUM_ORACLE,
    doc="Curriculum-learning bucket assignment: documents ranked by "
    "unigram-LM mean surprisal (easy -> hard) and cut into "
    "quintiles via ntile, each bucket reported with its token "
    "budget and mean surprisal — the table a curriculum schedule "
    "samples from (start training on bucket 1, anneal toward 5). "
    "The rank key is the fixed-point integer s*1e6/n_tokens (no "
    "float division inside the sort), ties broken by doc_id, so "
    "bucket boundaries are engine-independent. Bucket assignment "
    "is the two-phase distributed rank + closed-form ntile "
    "arithmetic (functions/topk.global_rank) over per-doc rows — "
    "no single-partition window even when the per-doc table is "
    "corpus-sized; everything upstream is the surprisal machinery "
    "shared with unigram_surprisal_score.",
    tags=("training", "text"),
)
def curriculum_difficulty_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    dict_df = toks.groupBy("term").agg(F.count("*").alias("tf"))
    tot = dict_df.agg(F.sum("tf").alias("n"))
    scored = (
        toks.join(F.broadcast(dict_df), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("n").cast("double") / F.col("tf")) * F.lit(1e9))
            .cast("long")
            .alias("s_fp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("s_fp").alias("s")
    )
    # exact BIGINT integer division on both engines (s*1e6 can exceed
    # the double-exact range, so float division would drift)
    keyed = per_doc.withColumn("_diff", F.expr("s * 1000000 DIV n_tokens"))
    ranked = global_rank(
        keyed,
        [F.asc("_diff"), F.asc("doc_id")],
        rank_col="rn",
        total_col="n_tot",
    )
    bucketed = ranked.select(
        "n_tokens", "s", ntile_from_rank("rn", "n_tot", 5).alias("bucket")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens_total"),
            F.round(
                F.sum("s").cast("double") / F.sum("n_tokens") / F.lit(1e9), 6
            ).alias("avg_surprisal"),
        )
        .orderBy("bucket")
    )
