"""Text-pipeline queries: language ID, quality scoring, token
counting, fingerprinting, chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_sql
from memories_spark.operators import chunking as chunk_op
from memories_spark.operators import textstats as ts_op
from memories_spark.operators.partitioning import spread_for_compute
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_LANG_QUALITY_ORACLE = f"""
SELECT doc_id,
       {ts_op.predict_lang_sql('text')} AS pred_lang,
       round({ts_op.quality_score_sql('text')}, 6) AS quality,
       {ts_op.token_counts_sql('text')['ws_tokens']} AS ws_tokens,
       {ts_op.token_counts_sql('text')['bpe_ish_tokens']} AS bpe_ish_tokens
FROM documents ORDER BY doc_id
"""


@register(
    "lang_quality_profile",
    oracle=_LANG_QUALITY_ORACLE,
    bench=True,
    doc="Per-document language-ID heuristic (marker-word argmax), "
    "composite quality score (Gopher/C4-style rule filter) and "
    "whitespace + BPE-ish token counts — one corpus scan, all "
    "codegen expressions.",
    tags=("text", "quality"),
)
def lang_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    # Tokenize ONCE into a real column: lang-ID, quality and counts all
    # consume the token array, and inlining the regex split per use
    # would re-split every row ~10x in the scan.
    toked = spread_for_compute(docs).select(
        "doc_id", "text", ts_op.tokens_expr("text").alias("toks")
    )
    toks = F.col("toks")
    counts = ts_op.token_counts("text", toks)
    out = toked.select(
        "doc_id",
        ts_op.predict_lang_expr("text", toks).alias("pred_lang"),
        F.round(ts_op.quality_score_expr("text", toks), 6).alias("quality"),
        counts["ws_tokens"].alias("ws_tokens"),
        counts["bpe_ish_tokens"].alias("bpe_ish_tokens"),
    )
    # Lazy checkpoint: the global sort's range partitioner samples its
    # child, which would re-run the whole regex battery a second time;
    # materializing the (narrow) profile rows makes it run exactly once.
    return out.localCheckpoint(eager=False).orderBy("doc_id")


_FP = ts_op.fingerprint_sql("text")
_FINGERPRINT_ORACLE = f"""
SELECT doc_id, {_FP['fp_min']} AS fp_min, {_FP['fp_max']} AS fp_max,
       {_FP['n_shingles']} AS n_shingles
FROM documents ORDER BY doc_id
"""


@register(
    "doc_fingerprints",
    oracle=_FINGERPRINT_ORACLE,
    doc="Winnowing-lite rolling fingerprints: min/max md5 over 8-char "
    "shingles + distinct-shingle cardinality (MOSS-style dedup key).",
    tags=("text", "dedup"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    fp = ts_op.fingerprint_exprs("text")
    return docs.select(
        "doc_id",
        fp["fp_min"].alias("fp_min"),
        fp["fp_max"].alias("fp_max"),
        fp["n_shingles"].alias("n_shingles"),
    ).orderBy("doc_id")


_HEAVY_ORACLE = f"""
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT unnest({tokens_sql('text')}) AS term FROM documents
)
GROUP BY term ORDER BY n DESC, term ASC LIMIT 20
"""


@register(
    "heavy_hitter_terms_salted",
    oracle=_HEAVY_ORACLE,
    bench=True,
    doc="Top-20 corpus terms via explicit two-stage salted "
    "aggregation: explode tokens, pre-aggregate on (term, "
    "doc_id%16 salt), then final sum per term. Term frequency is "
    "Zipf-skewed, so at 100 TB a single-stage groupBy(term) sends "
    "every occurrence of the hottest term to one reducer; the salt "
    "stage bounds any reducer's share of a hot key to 1/16 before "
    "the (tiny) final agg. The salt never reaches the result — "
    "output is deterministic and oracle-identical.",
    tags=("text", "agg", "skew"),
)
def heavy_hitter_terms_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    exploded = docs.select(
        (F.col("doc_id") % 16).alias("_salt"),
        F.explode(ts_op.tokens_expr("text")).alias("term"),
    )
    partial = exploded.groupBy("_salt", "term").agg(F.count("*").alias("c"))
    return (
        partial.groupBy("term")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


_CHUNK_ORACLE = chunk_op.chunk_sql("documents", "doc_id", "text")


@register(
    "chunk_documents",
    oracle=_CHUNK_ORACLE,
    doc="Fixed-window chunking with overlap (reference S1 "
    "chunk_markdown, memory_engine.py:370-421): 120-char windows, "
    "20-char overlap, >=30-char fragments; pure sequence+substring "
    "explode.",
    tags=("text", "chunking"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return chunk_op.chunk_documents(docs, "doc_id", "text")


# ---------------------------------------------------------------------
# Vocabulary growth curve (Heaps'-law diagnostic)
# ---------------------------------------------------------------------

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
),
firsts AS (
  SELECT term, CAST(min(doc_id) AS BIGINT) AS first_doc FROM toks GROUP BY term
),
bounds AS (SELECT max(doc_id) AS max_doc FROM documents),
cuts AS (
  SELECT CAST(ceil((x + 1) * (CAST((SELECT max_doc FROM bounds) + 1 AS DOUBLE) / 10.0)) AS BIGINT) AS cutoff
  FROM (SELECT unnest(generate_series(0, 9)) AS x)
),
tok_counts AS (
  SELECT c.cutoff, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks t JOIN cuts c ON t.doc_id < c.cutoff
  GROUP BY c.cutoff
),
vocab AS (
  SELECT c.cutoff, CAST(count(*) AS BIGINT) AS n_terms
  FROM firsts f JOIN cuts c ON f.first_doc < c.cutoff
  GROUP BY c.cutoff
)
SELECT t.cutoff, t.n_tokens, v.n_terms,
       round(CAST(v.n_terms AS DOUBLE) / t.n_tokens, 6) AS type_token_ratio
FROM tok_counts t JOIN vocab v ON v.cutoff = t.cutoff
ORDER BY t.cutoff
"""


@register(
    "vocab_growth_curve",
    oracle=_VOCAB_ORACLE,
    doc="Vocabulary growth (Heaps'-law) diagnostic: distinct terms and "
    "type/token ratio at ten document-count cutoffs — the corpus "
    "saturation signal that tells a training pipeline whether more "
    "of the same source still adds vocabulary. Plan: the term "
    "first-appearance table (one groupBy-min over the exploded "
    "token stream) makes every cutoff a COUNT over first_doc < c "
    "instead of ten distinct-aggregations of the corpus; the ten "
    "cutoffs join by broadcast. Token totals reuse the same "
    "exploded scan.",
    tags=("text", "training", "diagnostic"),
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select("doc_id", F.explode(ts_op.tokens_expr("text")).alias("term"))
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    bounds = docs.agg(F.max("doc_id").alias("max_doc"))
    cuts = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("x"), "max_doc"
    ).select(
        F.ceil((F.col("x") + 1) * ((F.col("max_doc") + 1).cast("double") / 10.0))
        .cast("long")
        .alias("cutoff")
    )
    tok_counts = (
        toks.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count("*").alias("n_tokens"))
    )
    vocab = (
        firsts.crossJoin(F.broadcast(cuts))
        .filter(F.col("first_doc") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count("*").alias("n_terms"))
    )
    return (
        tok_counts.join(vocab, "cutoff")
        .select(
            "cutoff",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.round(F.col("n_terms").cast("double") / F.col("n_tokens"), 6).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("cutoff")
    )


# ---------------------------------------------------------------------
# Zipf rank-frequency slope (log-log OLS over the top-100 terms)
# ---------------------------------------------------------------------

_ZIPF_ORACLE = f"""
WITH freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({tokens_sql('text')}) AS term FROM documents)
  GROUP BY term
),
top AS (
  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS BIGINT) AS rank
  FROM freq QUALIFY rank <= 100
),
pts AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e9) AS BIGINT) AS x_fp,
         CAST(round(ln(CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS y_fp
  FROM top
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x_fp) AS BIGINT) AS sx, CAST(sum(y_fp) AS BIGINT) AS sy,
         CAST(sum(CAST(round((CAST(x_fp AS DOUBLE)/1e9) * (CAST(y_fp AS DOUBLE)/1e9) * 1e9) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(round((CAST(x_fp AS DOUBLE)/1e9) * (CAST(x_fp AS DOUBLE)/1e9) * 1e9) AS BIGINT)) AS BIGINT) AS sxx
  FROM pts
)
SELECT m AS n_points,
       round((m * (CAST(sxy AS DOUBLE)/1e9) - (CAST(sx AS DOUBLE)/1e9) * (CAST(sy AS DOUBLE)/1e9))
             / (m * (CAST(sxx AS DOUBLE)/1e9) - (CAST(sx AS DOUBLE)/1e9) * (CAST(sx AS DOUBLE)/1e9)), 4) AS zipf_slope
FROM sums
"""


@register(
    "zipf_slope_fit",
    oracle=_ZIPF_ORACLE,
    doc="Zipf's-law fit: OLS slope of log(frequency) on log(rank) over "
    "the top-100 corpus terms (a natural corpus sits near -1; "
    "synthetic or templated text drifts off it — the companion "
    "diagnostic to vocab_growth_curve). Every regression moment is "
    "an exact fixed-point BIGINT sum of per-point rounded terms, so "
    "the slope is order-independent and engine-identical; ranks tie "
    "on term ASC. One explode+groupBy for frequencies, a top-100 "
    "window on the (vocabulary-sized) frequency table, then a "
    "five-number aggregate.",
    tags=("text", "diagnostic", "regression"),
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    freq = (
        docs.select(F.explode(ts_op.tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    top = freq.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 100)
    x_fp = F.round(F.log(F.col("rank").cast("double")) * 1e9).cast("long")
    y_fp = F.round(F.log(F.col("n").cast("double")) * 1e9).cast("long")
    pts = top.select(x_fp.alias("x_fp"), y_fp.alias("y_fp"))
    xd = F.col("x_fp").cast("double") / 1e9
    yd = F.col("y_fp").cast("double") / 1e9
    sums = pts.agg(
        F.count("*").alias("m"),
        F.sum("x_fp").cast("long").alias("sx"),
        F.sum("y_fp").cast("long").alias("sy"),
        F.sum(F.round(xd * yd * 1e9).cast("long")).cast("long").alias("sxy"),
        F.sum(F.round(xd * xd * 1e9).cast("long")).cast("long").alias("sxx"),
    )
    sxd = F.col("sx").cast("double") / 1e9
    syd = F.col("sy").cast("double") / 1e9
    sxyd = F.col("sxy").cast("double") / 1e9
    sxxd = F.col("sxx").cast("double") / 1e9
    return sums.select(
        F.col("m").cast("long").alias("n_points"),
        F.round(
            (F.col("m") * sxyd - sxd * syd) / (F.col("m") * sxxd - sxd * sxd), 4
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------
# Dictionary taxonomy tagging (domain labeling for training data)
# ---------------------------------------------------------------------

#: (term, category, weight) — the tagging dictionary. Weights are
#: INTEGERS so per-doc scores are exact BIGINT sums. Multi-word terms
#: would match over word_shingles_expr the same way; the synthetic
#: corpus vocabulary is unigram, so the dictionary is too.
_TAXONOMY = [
    ("join", "joins", 3), ("merge", "joins", 2), ("hash", "joins", 2),
    ("scan", "scans", 3), ("filter", "scans", 2), ("table", "scans", 1),
    ("stream", "streaming", 3), ("window", "streaming", 2), ("batch", "streaming", 2),
    ("agg", "aggregation", 3), ("group", "aggregation", 2), ("sort", "aggregation", 1),
    ("vector", "vectors", 3), ("dup", "vectors", 2),
]

#: Multi-word dictionary terms: matched over the 2-word shingle
#: stream exactly like unigrams over tokens — this is what makes the
#: operator true multi-pattern matching, not a per-token lookup. A
#: phrase hit outscores its constituent words (e.g. "hash join" is a
#: stronger joins signal than "hash" + "join" separately).
_TAXONOMY_BIGRAMS = [
    ("hash join", "joins", 5),
    ("table scan", "scans", 5),
    ("window agg", "aggregation", 5),
]

_TAXONOMY_VALUES = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in _TAXONOMY)
_TAXONOMY_BG_VALUES = ", ".join(
    f"('{t}', '{c}', {w})" for t, c, w in _TAXONOMY_BIGRAMS
)

_TAXONOMY_ORACLE = f"""
WITH dict(term, category, w) AS (VALUES {_TAXONOMY_VALUES}),
bdict(term, category, w) AS (VALUES {_TAXONOMY_BG_VALUES}),
toked AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
toks AS (
  SELECT doc_id, unnest(tk) AS term FROM toked
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                               i -> tk[i] || ' ' || tk[i+1])) AS term
  FROM toked
),
hits AS (
  SELECT t.doc_id, d.category, d.w
  FROM toks t JOIN dict d ON t.term = d.term
  UNION ALL
  SELECT b.doc_id, d.category, d.w
  FROM bigrams b JOIN bdict d ON b.term = d.term
),
scores AS (
  SELECT doc_id, category,
         CAST(sum(w) AS BIGINT) AS score_w,
         CAST(count(*) AS BIGINT) AS n_hits
  FROM hits
  GROUP BY doc_id, category
)
SELECT doc_id, category, score_w, n_hits
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_w DESC, category ASC
  ) AS rn
  FROM scores
) WHERE rn = 1
ORDER BY doc_id
"""


@register(
    "taxonomy_tag_documents",
    oracle=_TAXONOMY_ORACLE,
    doc="Dictionary taxonomy tagging — the domain-labeling step of a "
    "training-data pipeline (CCNet/Dolma-style: label every document "
    "with its dominant domain from a curated keyword dictionary, "
    "then mixtures/filters key on the label). The dictionary is a "
    "broadcast (term, category, integer-weight) table; tokens join "
    "it (the flattened unigram form of multi-pattern matching — "
    "multi-word terms would join word shingles identically), scores "
    "are exact BIGINT tf-weighted sums partial-aggregated on "
    "(doc, category), and the per-doc argmax breaks ties by category "
    "name. One corpus scan, one partial-agg shuffle, dictionary "
    "never leaves the broadcast — the shape holds at 100 TB for any "
    "dictionary that fits an executor (real taxonomies are 10^3-10^5 "
    "terms).",
    tags=("text", "training"),
)
def taxonomy_tag_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.functions.texttools import bounded_seq, tokens_expr

    docs = load_tables(spark, sf_dir)["documents"]
    dict_df = spark.createDataFrame(_TAXONOMY, "term string, category string, w int")
    bdict_df = spark.createDataFrame(
        _TAXONOMY_BIGRAMS, "term string, category string, w int"
    )
    toked = docs.select("doc_id", tokens_expr("text").alias("tk"))
    toks = toked.select("doc_id", F.explode("tk").alias("term"))
    # occurrence-counted 2-word shingles (NOT distinct — tf weighting
    # must count repeats, same as the unigram side); bounded_seq keeps
    # <=1-token docs at zero bigrams instead of a slice(0) crash
    bg_idx = bounded_seq(F.size("tk") - 1)
    bigrams = toked.select(
        "doc_id",
        F.explode(
            F.transform(bg_idx, lambda i: F.concat_ws(" ", F.slice("tk", i, 2)))
        ).alias("term"),
    )
    hits = toks.join(F.broadcast(dict_df), "term").unionByName(
        bigrams.join(F.broadcast(bdict_df), "term")
    )
    scores = hits.groupBy("doc_id", "category").agg(
        F.sum("w").cast("long").alias("score_w"),
        F.count("*").cast("long").alias("n_hits"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_w"), F.asc("category"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "category", "score_w", "n_hits")
        .orderBy("doc_id")
    )
