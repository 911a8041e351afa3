"""Text-pipeline queries: language ID, quality scoring, token
counting, fingerprinting, chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_sql
from memories_spark.operators import chunking as chunk_op
from memories_spark.operators import textstats as ts_op
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
    toked = docs.select(
        "doc_id", "text", ts_op.tokens_expr("text").alias("toks")
    )
    toks = F.col("toks")
    counts = ts_op.token_counts("text", toks)
    return toked.select(
        "doc_id",
        ts_op.predict_lang_expr("text", toks).alias("pred_lang"),
        F.round(ts_op.quality_score_expr("text", toks), 6).alias("quality"),
        counts["ws_tokens"].alias("ws_tokens"),
        counts["bpe_ish_tokens"].alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


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
