"""BM25 (Okapi) scoring as pure DataFrame algebra.

Reproduces the exact rank_bm25 0.2.2 ``BM25Okapi`` variant the
reference depends on (reference memory_engine.py:224-232,
pyproject.toml:17): k1=1.5, b=0.75 and the epsilon floor — IDFs are
``ln((N - df + 0.5) / (df + 0.5))`` and *negative* IDFs are replaced
by ``eps * average_idf`` with eps=0.25, where ``average_idf`` is the
mean IDF over the whole vocabulary (including the negatives).

Scale design: the reference rebuilds BM25 over the full corpus on
every write — O(N) per write. Here the term statistics are derived
DataFrames (``terms``, ``doc_stats``, corpus scalars) produced by one
shuffle each and joinable against any query set. At 100 TB the
``terms`` table is the big one; it partitions by term for the
df-aggregation and the query join is a broadcast of the (tiny) query
term list — no full-corpus pass per query, and incremental
maintenance is a MERGE of term deltas instead of a rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memories_spark.functions.hashing import fixed_point, unfix
from memories_spark.functions.texttools import tokens_expr

K1 = 1.5
B = 0.75
EPSILON = 0.25
SCORE_SCALE = 9  # fixed-point digits for order-independent score sums


IDF_SCALE = 12  # fixed-point digits for the vocabulary-average IDF


def tokenize_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, term, tf)`` postings from a document corpus — the only
    stage that touches raw text. Everything else in BM25 derives from
    this table, which is what the persisted lexical index stores."""
    # NOT spread_for_compute'd (measured): tokenize is one regex split
    # per row, and the BM25 stats fan-out runs its copies of this
    # subtree as concurrent independent stages — adding an exchange
    # here cost more (extra AQE round + shuffle) than the parallelism
    # repaid (isolated postings noop A/B: 0.74s -> 1.08s at sf0.1).
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_expr(text_col)).alias("term")
    )
    return toks.groupBy("id", "term").agg(F.count("*").alias("tf"))


def stats_from_terms(
    terms: DataFrame, doc_stats: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Derive the global BM25 statistics from a ``(id, term, tf)``
    postings table (extra columns are ignored). Split out from
    :func:`build_term_stats` so the persisted lexical index can
    re-derive IDF/corpus scalars after an incremental postings merge
    WITHOUT re-tokenizing any document — the global stats are a
    single pass over the (already tokenized) postings.

    Fully lazy — no driver actions. Scalar corpus statistics
    (N, avgdl, avg raw IDF) are 1-row DataFrames that downstream
    plans broadcast-cross-join, so scoring is ONE Spark job end to
    end. The vocabulary-average IDF is an exact fixed-point integer
    mean, making it partition-order independent and identical in the
    DuckDB oracle.

    Returns ``terms(id, term, tf)``, ``doc_stats(id, dl)``,
    ``corpus(n, avgdl)`` and ``term_idf(term, idf)``
    (epsilon-floored, vocabulary-wide).
    """
    terms = terms.select("id", "term", "tf")
    if doc_stats is None:
        doc_stats = terms.groupBy("id").agg(F.sum("tf").alias("dl"))
    # dl are BIGINTs: the sum is exact, so avg is engine-identical.
    corpus = doc_stats.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    df_tab = terms.groupBy("term").agg(F.count("*").alias("df"))
    with_idf = df_tab.crossJoin(F.broadcast(corpus)).select(
        "term",
        F.log((F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))).alias(
            "raw_idf"
        ),
    )
    # average over the whole vocabulary, negatives included
    # (rank_bm25 semantics); exact integer mean at 1e12.
    avg_idf = with_idf.agg(
        (
            F.sum(fixed_point(F.col("raw_idf"), IDF_SCALE)).cast("double")
            / F.count("*")
            / F.lit(float(10**IDF_SCALE))
        ).alias("a")
    )
    term_idf = with_idf.crossJoin(F.broadcast(avg_idf)).select(
        "term",
        F.when(F.col("raw_idf") < 0, F.lit(EPSILON) * F.col("a"))
        .otherwise(F.col("raw_idf"))
        .alias("idf"),
    )
    # raw_idf/avg_idf are exported so the INLINE scoring path can
    # apply the epsilon floor per posting row instead of joining the
    # pre-floored vocabulary table: the floor is when(raw < 0, eps*a,
    # raw) either way (bit-identical), but deferring it takes the
    # vocabulary-mean aggregation OFF the scoring join's critical
    # path — avg_idf becomes a sibling broadcast branch that overlaps
    # with the postings join instead of gating it (guide §2.6: the
    # broadcast-exchange future runs concurrently). The persisted
    # lexical index keeps consuming term_idf (its on-disk layout).
    return {
        "terms": terms,
        "doc_stats": doc_stats,
        "term_idf": term_idf,
        "corpus": corpus,
        "raw_idf": with_idf,
        "avg_idf": avg_idf,
    }


def build_term_stats(docs: DataFrame, id_col: str, text_col: str) -> dict[str, DataFrame]:
    """Tokenize + derive in one lazy plan (see :func:`stats_from_terms`).

    ``dl`` (per-doc length) equals ``sum(tf)`` over the postings,
    which is just the token count — so when the raw text is in hand,
    doc lengths come from a shallow one-scan projection instead of
    the tokenize→explode→groupBy subtree. That removes one of the
    four postings-subtree consumers from the plan (smaller logical
    plan → cheaper per-invocation Catalyst analysis, one fewer
    tokenize stage at execution). The ``dl > 0`` filter keeps it
    value-identical: a doc with zero tokens has no postings rows and
    is therefore absent from the aggregated version too (and from
    ``corpus``'s N/avgdl).
    """
    doc_stats = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens_expr(text_col)).cast("long").alias("dl"),
    ).filter(F.col("dl") > 0)
    return stats_from_terms(tokenize_terms(docs, id_col, text_col), doc_stats)


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    stats: dict | None = None,
) -> DataFrame:
    """Score every matching document for a bag of query terms.

    Returns ``(id, score)`` with ``score`` rounded from an exact
    fixed-point sum (order-independent across engines/partitionings).
    Query term multiplicity counts, like rank_bm25's per-token loop.

    Plan shape: the (tiny) query-term list joins the vocabulary IDF
    table first, the result broadcasts into the posting join — the
    big ``terms`` relation is filtered to query terms without a
    shuffle, then joined to per-doc lengths.
    """
    spark = docs.sparkSession
    stats = stats or build_term_stats(docs, id_col, text_col)
    terms, doc_stats, term_idf = stats["terms"], stats["doc_stats"], stats["term_idf"]

    qdf = spark.createDataFrame([(t,) for t in query_terms], "term string")
    qcount = qdf.groupBy("term").agg(F.count("*").alias("qtf"))

    if "raw_idf" in stats:
        # Inline stats: floor the IDF per contribution row instead of
        # pre-floored vocabulary join — when(raw < 0, eps*a, raw) is
        # the identical expression, but the vocabulary-mean branch
        # (avg_idf) now broadcasts into the FINAL projection rather
        # than gating the query-term join, so the two full-vocabulary
        # aggregations overlap with the postings join instead of
        # running serially ahead of it.
        qidf = stats["raw_idf"].join(F.broadcast(qcount), "term")
        idf_expr = (
            F.when(F.col("raw_idf") < 0, F.lit(EPSILON) * F.col("a"))
            .otherwise(F.col("raw_idf"))
        )
        extra = [F.broadcast(stats["avg_idf"])]
    else:
        # Persisted-index stats: term_idf is a pre-floored on-disk
        # table pruned to the query terms — nothing to defer.
        qidf = term_idf.join(F.broadcast(qcount), "term")
        idf_expr = F.col("idf")
        extra = []

    contrib = terms.join(F.broadcast(qidf), "term").join(doc_stats, "id").crossJoin(
        F.broadcast(stats["corpus"].select("avgdl"))
    )
    for aux in extra:
        contrib = contrib.crossJoin(aux)
    contrib = contrib.select(
        "id",
        fixed_point(
            F.col("qtf")
            * idf_expr
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
            SCORE_SCALE,
        ).alias("c"),
    )
    return contrib.groupBy("id").agg(unfix(F.sum("c"), SCORE_SCALE).alias("score"))


def bm25_sql(
    docs_view: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int | None = None,
    round_dp: int = 6,
) -> str:
    """DuckDB oracle SQL mirroring :func:`bm25_scores` exactly.

    The fixed-point trick makes the per-doc sum identical regardless
    of each engine's aggregation order.
    """
    qvals = ", ".join(f"('{t}')" for t in query_terms)
    limit = (
        f"ORDER BY score DESC, {id_col} ASC LIMIT {k}" if k else f"ORDER BY {id_col}"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'), t -> t != '')) AS term
  FROM {docs_view}
),
terms AS (SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
doc_stats AS (SELECT {id_col}, CAST(sum(tf) AS BIGINT) AS dl FROM terms GROUP BY 1),
corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM doc_stats),
dfreq AS (SELECT term, CAST(count(DISTINCT {id_col}) AS DOUBLE) AS df FROM terms GROUP BY 1),
rawidf AS (SELECT term, ln(((SELECT n FROM corpus) - df + 0.5) / (df + 0.5)) AS raw_idf FROM dfreq),
avgidf AS (
  SELECT (CAST(sum(CAST(round(raw_idf * 1e{IDF_SCALE}) AS BIGINT)) AS DOUBLE)
          / count(*)) / 1e{IDF_SCALE} AS a
  FROM rawidf
),
idf AS (
  SELECT term,
         CASE WHEN raw_idf < 0 THEN {EPSILON} * (SELECT a FROM avgidf) ELSE raw_idf END AS idf
  FROM rawidf
),
q AS (SELECT term, CAST(count(*) AS BIGINT) AS qtf FROM (VALUES {qvals}) v(term) GROUP BY 1),
contrib AS (
  SELECT t.{id_col},
         CAST(round((q.qtf * i.idf * (t.tf * ({K1} + 1))
              / (t.tf + {K1} * (1 - {B} + {B} * d.dl / (SELECT avgdl FROM corpus))))
              * 1e{SCORE_SCALE}) AS BIGINT) AS c
  FROM terms t
  JOIN q ON q.term = t.term
  JOIN idf i ON i.term = t.term
  JOIN doc_stats d ON d.{id_col} = t.{id_col}
)
SELECT {id_col}, round(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 1e{SCORE_SCALE}, {round_dp}) AS score
FROM contrib
GROUP BY {id_col}
{limit}
"""
