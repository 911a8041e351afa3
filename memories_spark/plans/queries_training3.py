"""Training-data pipeline queries, batch 3: PII scanning/redaction,
cross-document window dedup, temperature-based source mixing, and
document-length histograms.

Corpus-hygiene and mixture-design operators a pretraining pipeline
runs after filtering and dedup. The synthetic documents table has no
real PII, so the PII query injects deterministic fake PII in-query
(same expression in Spark and the DuckDB oracle) — the regex
extraction is therefore genuinely exercised and verified nonzero,
not vacuously zero-matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import hex_frac_sql
from memories_spark.functions.texttools import bounded_seq, tokens_sql, tokens_expr
from memories_spark.operators.partitioning import spread_for_compute
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# PII scan + redaction profile
# ---------------------------------------------------------------------

# Deterministic fake-PII injection: every 7th document gains an email,
# every 11th a US-style phone number. Identical SQL in both engines.
_ENRICH_SQL = """
text
|| CASE WHEN doc_id % 7 = 0
        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        ELSE '' END
|| CASE WHEN doc_id % 11 = 0
        THEN ' call 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR) || ' today'
        ELSE '' END
"""

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4,8}"

_PII_ORACLE = f"""
WITH enriched AS (
  SELECT doc_id, ({_ENRICH_SQL}) AS etext FROM documents
),
scanned AS (
  SELECT doc_id,
         CAST(length(etext) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(etext, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(etext, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
         length(regexp_replace(regexp_replace(etext, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                               '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_len
  FROM enriched
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(sum(n_phones) AS BIGINT) AS total_phones,
       CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(sum(n_chars - redacted_len) AS BIGINT) AS chars_redacted_delta
FROM scanned
"""


@register(
    "pii_redaction_profile",
    oracle=_PII_ORACLE,
    bench=True,
    doc="PII scan + redaction accounting: email and phone regex "
    "extraction counts and the net character delta after replacing "
    "matches with [EMAIL]/[PHONE] placeholders. Fake PII is "
    "injected deterministically in-query (docs have none) so the "
    "regexes verifiably fire. Plan: single scan, pure regexp_"
    "extract_all/regexp_replace projection inside codegen, one "
    "partial+final aggregate — at 100 TB a PII pass is scan-bound "
    "and this plan adds zero shuffles beyond the 5-number rollup.",
    tags=("text", "pii", "training"),
)
def pii_redaction_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    etext = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-01"),
                (F.col("doc_id") % 90 + 10).cast("string"),
                F.lit(" today"),
            ),
        ).otherwise(F.lit("")),
    )
    scanned = docs.select(
        F.length(etext).cast("long").alias("n_chars"),
        F.size(F.regexp_extract_all(etext, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(etext, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(etext, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
            )
        ).alias("redacted_len"),
    )
    return scanned.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_phones").cast("long").alias("total_phones"),
        F.sum(F.when(F.col("n_emails") + F.col("n_phones") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_pii"),
        F.sum(F.col("n_chars") - F.col("redacted_len"))
        .cast("long")
        .alias("chars_redacted_delta"),
    )


# ---------------------------------------------------------------------
# Cross-document window dedup (paragraph-dedup analogue)
# ---------------------------------------------------------------------

_WIN = 10  # tokens per window (non-overlapping), the "paragraph" unit

_XDOC_ORACLE = f"""
WITH toked AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
wins AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(toks) // {_WIN}, 0) + 1),
           w -> md5(array_to_string(toks[(w - 1) * {_WIN} + 1 : w * {_WIN}], ' '))
         )) AS wh
  FROM toked
),
freq AS (
  SELECT wh, CAST(count(*) AS BIGINT) AS n FROM wins GROUP BY wh
),
per_doc AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
  FROM wins w JOIN freq f ON w.wh = f.wh
  GROUP BY w.doc_id
)
SELECT doc_id, n_windows, dup_windows,
       round(CAST(dup_windows AS DOUBLE) / n_windows, 6) AS dup_share
FROM per_doc
WHERE dup_windows > 0
ORDER BY dup_share DESC, doc_id ASC
LIMIT 50
"""


@register(
    "crossdoc_window_dedup",
    oracle=_XDOC_ORACLE,
    bench=True,
    doc="Cross-document duplicated-passage share (the paragraph-dedup "
    "pipeline op, RefinedWeb-style, applied at 10-token window "
    "granularity since the synthetic corpus has no newlines): "
    "fraction of each document's non-overlapping token windows "
    "whose hash occurs in more than one place corpus-wide. Plan: "
    "windows explode via sequence+slice (codegen, no UDF), one "
    "groupBy on the 16-byte window hash builds the frequency table "
    "(map-side combine absorbs within-partition repeats), and the "
    "per-doc rollup joins hash-to-hash. Top-50 offenders via "
    "TakeOrderedAndProject. This complements repetition_profile "
    "(intra-doc) and minhash/simhash (whole-doc near-dup) with the "
    "passage-level cross-doc axis.",
    tags=("text", "dedup", "training"),
)
def crossdoc_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_for_compute(load_tables(spark, sf_dir)["documents"])
    toks = tokens_expr("text")
    n_wins = F.floor(F.size(toks) / _WIN).cast("int")
    wins = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                # bounded_seq: docs with < _WIN tokens yield ZERO windows
                # (sequence(1,0) fabricated a w=1 partial window + a
                # negative-start w=0 slice)
                bounded_seq(n_wins),
                lambda w: F.md5(
                    F.concat_ws(" ", F.slice(toks, (w - 1) * _WIN + 1, _WIN))
                ),
            )
        ).alias("wh"),
    )
    freq = wins.groupBy("wh").agg(F.count("*").alias("n"))
    per_doc = (
        wins.join(freq, "wh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("dup_windows"),
        )
    )
    return (
        per_doc.filter(F.col("dup_windows") > 0)
        .select(
            "doc_id",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("dup_windows").cast("long").alias("dup_windows"),
            F.round(
                F.col("dup_windows").cast("double") / F.col("n_windows"), 6
            ).alias("dup_share"),
        )
        .orderBy(F.desc("dup_share"), F.asc("doc_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------
# Temperature-based source mixing weights
# ---------------------------------------------------------------------

_ALPHA = 0.5  # temperature exponent; < 1 upsamples small sources

_MIX_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(sum(len({tokens_sql('text')})) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM per_src),
powed AS (
  SELECT source, toks,
         power(CAST(toks AS DOUBLE) / total, {_ALPHA}) AS p
  FROM per_src, tot
),
z AS (SELECT sum(p) AS zsum FROM powed)
SELECT source, toks AS source_tokens,
       round(p / zsum, 6) AS mix_weight,
       round((p / zsum) / (CAST(toks AS DOUBLE) / (SELECT total FROM tot)), 4) AS upsample_factor
FROM powed, z
ORDER BY mix_weight DESC, source ASC
"""


@register(
    "source_mixing_weights",
    oracle=_MIX_ORACLE,
    doc="Temperature-based mixture weights per source (alpha=0.5 "
    "power-law flattening, the multilingual/domain upsampling rule "
    "used in large-corpus training recipes): w_s proportional to "
    "share^alpha, normalized, with the implied upsample factor vs "
    "natural sampling. Plan: one token-count aggregate per source "
    "(the only data-sized shuffle), then two 1-row broadcasts "
    "(total, normalizer) — at 100 TB the mixture computation costs "
    "one pass. The sum over p is |sources| doubles on a single "
    "node, deterministic because every p derives from exact BIGINT "
    "token counts and the sum is over the same sorted tiny set in "
    "both engines.",
    tags=("training", "mixing", "agg"),
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(tokens_expr("text"))).cast("long").alias("toks")
    )
    tot = per_src.agg(F.sum("toks").cast("long").alias("total"))
    powed = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        "total",
        F.pow(F.col("toks").cast("double") / F.col("total"), _ALPHA).alias("p"),
    )
    z = powed.agg(F.sum("p").alias("zsum"))
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("toks").alias("source_tokens"),
            F.round(F.col("p") / F.col("zsum"), 6).alias("mix_weight"),
            F.round(
                (F.col("p") / F.col("zsum"))
                / (F.col("toks").cast("double") / F.col("total")),
                4,
            ).alias("upsample_factor"),
        )
        .orderBy(F.desc("mix_weight"), F.asc("source"))
    )


# ---------------------------------------------------------------------
# Document length histogram (log2 buckets + cumulative share)
# ---------------------------------------------------------------------

_HIST_ORACLE = f"""
WITH lens AS (
  SELECT CAST(floor(log2(greatest(len({tokens_sql('text')}), 1))) AS BIGINT) AS bucket
  FROM documents
),
hist AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs FROM lens GROUP BY bucket
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM hist)
SELECT bucket,
       CAST(power(2, bucket) AS BIGINT) AS min_tokens,
       n_docs,
       round(CAST(sum(n_docs) OVER (ORDER BY bucket) AS DOUBLE) / total, 6) AS cum_share
FROM hist, tot
ORDER BY bucket
"""


@register(
    "doc_length_histogram",
    oracle=_HIST_ORACLE,
    doc="Token-length histogram in log2 buckets with cumulative "
    "document share — the length-distribution diagnostic run before "
    "choosing chunking and max-sequence-length parameters. Plan: "
    "single scan projecting floor(log2(len)) per doc, partial+final "
    "aggregate to ~30 buckets, then a window over the tiny bucket "
    "table. The cumulative share divides exact BIGINTs.",
    tags=("training", "histogram", "agg"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.floor(
        F.log2(F.greatest(F.size(tokens_expr("text")), F.lit(1)))
    ).cast("long")
    hist = docs.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n_docs")
    )
    tot = hist.agg(F.sum("n_docs").cast("long").alias("total"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket").cast("double")).cast("long").alias("min_tokens"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.sum("n_docs").over(w).cast("double") / F.col("total"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------
# Mixture-weighted deterministic sampling (applies the mixing weights)
# ---------------------------------------------------------------------

_SAMPLE_BUDGET = 0.10  # sample 10% of the corpus, allocated by mixture

_WSAMPLE_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM per_src),
powed AS (
  SELECT source, n_docs, power(CAST(n_docs AS DOUBLE) / total, 0.5) AS p
  FROM per_src, tot
),
z AS (SELECT sum(p) AS zsum FROM powed),
rates AS (
  SELECT pw.source, pw.n_docs,
         least(1.0, (pw.p / z.zsum) * {_SAMPLE_BUDGET} * t.total / pw.n_docs) AS rate
  FROM powed pw, z, tot t
),
sampled AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_sampled
  FROM documents d JOIN rates r ON r.source = d.source
  WHERE {hex_frac_sql("md5('sample:' || CAST(d.doc_id AS VARCHAR))")} < r.rate
  GROUP BY d.source
)
SELECT r.source, r.n_docs, round(r.rate, 6) AS rate,
       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
FROM rates r LEFT JOIN sampled s ON s.source = r.source
ORDER BY r.source
"""


@register(
    "mixture_weighted_sample",
    oracle=_WSAMPLE_ORACLE,
    doc="Deterministic mixture-weighted sampling: allocate a 10% "
    "corpus budget across sources by the temperature weights "
    "(share^0.5 — see source_mixing_weights), then admit each "
    "document iff its seeded md5 fraction falls below its source's "
    "rate. The accept/reject test is a pure per-row hash compare "
    "(reproducible across engines, re-runs, and partitionings — "
    "unlike rand()-based sampling), so the same sample comes out "
    "on every run at any scale. Rates table is |sources| rows "
    "broadcast onto the scan; one aggregate each side.",
    tags=("training", "sampling", "mixing"),
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    per_src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per_src.agg(F.sum("n_docs").cast("long").alias("total"))
    powed = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total",
        F.pow(F.col("n_docs").cast("double") / F.col("total"), 0.5).alias("p"),
    )
    z = powed.agg(F.sum("p").alias("zsum"))
    rates = powed.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            (F.col("p") / F.col("zsum"))
            * _SAMPLE_BUDGET
            * F.col("total")
            / F.col("n_docs"),
        ).alias("rate"),
    )
    frac = F.expr(hex_frac_sql("md5(concat('sample:', CAST(doc_id AS STRING)))"))
    sampled = (
        docs.join(
            F.broadcast(rates.select(F.col("source").alias("rs"), "rate")),
            F.col("source") == F.col("rs"),
        )
        .filter(frac < F.col("rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        rates.join(
            sampled.withColumnRenamed("source", "ss"),
            F.col("source") == F.col("ss"),
            "left",
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("rate"), 6).alias("rate"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long").alias("n_sampled"),
        )
        .orderBy("source")
    )
