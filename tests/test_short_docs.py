"""Short-document hardening for the sequence(1,0) exploder family.

Spark's ``sequence(start, stop)`` auto-steps DESCENDING when
``stop < start``, so the old ``sequence(1, greatest(n, 0))`` idiom
yielded ``[1, 0]`` for n = 0: every shingle/n-gram/window exploder
either crashed (``slice`` start 0 throws INVALID_PARAMETER_VALUE) or
silently fabricated rows (``substr``/window variants) on any document
shorter than the n-gram width. The shipped testdata has a minimum
document length of 10 tokens at every sf, so the per-round oracle gate
cannot see this — but a real training corpus is full of empty and
one-token documents (the reference's own eval corpora contain
single-word strings; its chunker minimum is 30 CHARS, not tokens —
reference memory_engine.py:370-421).

This suite builds a fixture sf-dir whose ``documents`` table appends
0-, 1-, 2-, 3- and few-token documents (plus sub-8-char texts for the
fingerprint shingles and 1-char words for the BPE pair table, and a
short-doc duplicate pair so dedup queries still have candidates) and
whose ``events`` table appends users with 1- and 2-event histories
(sequence length < trigram width). Every consumer query then runs
Spark-vs-DuckDB parity on that fixture via the same machinery the
driver's correctness gate uses.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from memories_spark.plans.registry import QUERIES
from memories_spark.sources.tables import TABLE_NAMES
from tests.parity import compare

SRC = "/root/testdata/sf0.001"

# (doc_id, text) — the adversarial tail appended to the 500 real docs
_SHORT_DOCS = [
    (900001, ""),  # zero tokens, zero chars
    (900002, "   "),  # whitespace-only -> zero tokens
    (900003, "a"),  # one 1-char token (BPE pair fabrication case)
    (900004, "i"),  # second 1-char token
    (900005, "hello"),  # one token, < 8 chars (fingerprint shingle width)
    (900006, "data pipeline"),  # two tokens (3-gram width - 1)
    (900007, "the quick brown"),  # exactly the 3-gram width
    (900008, "machine learning training corpus"),  # 4 tokens < 10-token window
    (900009, "spark engine"),  # duplicate pair: dedup candidates among
    (900010, "spark engine"),  # short docs must not crash blocking joins
]

# Every registered query that enumerates positions over documents
# (shingles, n-grams, windows, char fingerprints, BPE pairs, chunking,
# token stats) or over per-user event sequences (trigrams).
CONSUMERS = [
    "minhash_near_dups",
    "simhash_sketch",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "dedup_victims",
    "decontaminate_ngram_overlap",
    "repetition_profile",
    "crossdoc_window_dedup",
    "split_ngram_leakage",
    "rareterm_jaccard_join",
    "bigram_surprisal_score",
    "inverted_index_postings",
    "bpe_first_merges",
    "taxonomy_tag_documents",
    "event_trigram_mining",
    "doc_fingerprints",
    "lang_quality_profile",
    "chunk_documents",
    "tfidf_top_terms",
    "heavy_hitter_terms_salted",
    "vocab_growth_curve",
    "zipf_slope_fit",
    "fuzzy_term_match",
]


@pytest.fixture(scope="module")
def short_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_shortdocs")
    con = duckdb.connect()
    try:
        doc_rows = ", ".join(
            f"(CAST({i} AS BIGINT), '{t}', 'en', 'shortfix/corpus', "
            f"CAST({len(t)} AS BIGINT))"
            for i, t in _SHORT_DOCS
        )
        con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{SRC}/documents.parquet')
              UNION ALL
              SELECT * FROM (VALUES {doc_rows})
                v(doc_id, text, lang, source, n_chars)
            ) TO '{d}/documents.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{SRC}/events.parquet')
              UNION ALL
              SELECT * FROM (VALUES
                (CAST(9900001 AS BIGINT), TIMESTAMP '2025-06-01 00:00:00',
                 CAST(990001 AS BIGINT), 'view', 1.0, '{{}}'),
                (CAST(9900002 AS BIGINT), TIMESTAMP '2025-06-01 00:01:00',
                 CAST(990002 AS BIGINT), 'view', 1.0, '{{}}'),
                (CAST(9900003 AS BIGINT), TIMESTAMP '2025-06-01 00:02:00',
                 CAST(990002 AS BIGINT), 'click', 1.0, '{{}}')
              ) v(event_id, ts, user_id, event_type, value, props)
            ) TO '{d}/events.parquet' (FORMAT PARQUET)
            """
        )
    finally:
        con.close()
    for name in TABLE_NAMES:
        if name not in ("documents", "events"):
            os.symlink(f"{SRC}/{name}.parquet", f"{d}/{name}.parquet")
    return str(d)


@pytest.mark.parametrize("name", CONSUMERS)
def test_short_doc_parity(spark, short_dir, name):
    spec = QUERIES[name]
    assert spec.oracle is not None, f"{name} lost its oracle"
    df = spec.fn(spark, short_dir)
    ok, msg = compare(df, spec.oracle, short_dir)
    assert ok, f"{name} diverges from oracle on short docs: {msg}"


def test_bpe_emits_no_single_char_pairs(spark, short_dir):
    """1-char words must contribute ZERO pairs (the raw sequence(1,0)
    idiom emitted the word itself twice, double-weighting it)."""
    rows = QUERIES["bpe_first_merges"].fn(spark, short_dir).collect()
    assert rows, "bpe_first_merges returned nothing"
    assert all(len(r["pair"]) == 2 for r in rows)


def test_shingle_exprs_on_short_inputs(spark):
    from pyspark.sql import functions as F

    from memories_spark.functions.texttools import (
        bounded_seq,
        char_shingles_expr,
        word_shingles_expr,
    )

    df = spark.createDataFrame(
        [("",), ("  ",), ("a",), ("a b",), ("a b c",), ("a b c d",)],
        "text string",
    )
    out = df.select(
        "text",
        word_shingles_expr("text", 3).alias("w3"),
        char_shingles_expr("text", 8).alias("c8"),
        bounded_seq(F.size(F.split("text", " ")) - 5).alias("bs"),
    ).collect()
    by_text = {r["text"]: r for r in out}
    assert by_text[""]["w3"] == []
    assert by_text["  "]["w3"] == []
    assert by_text["a"]["w3"] == []
    assert by_text["a b"]["w3"] == []
    assert by_text["a b c"]["w3"] == ["a b c"]
    assert by_text["a b c d"]["w3"] == ["a b c", "b c d"]
    # char shingles: all inputs here are < 8 chars -> empty sets
    assert all(r["c8"] == [] for r in out if len(r["text"]) < 8)
    assert all(r["bs"] == [] for r in out)  # every bound here is < 1


def test_fingerprint_empty_on_short_text(spark):
    from memories_spark.operators.textstats import fingerprint_exprs

    df = spark.createDataFrame([("tiny",), ("exactly8",)], "text string")
    fp = fingerprint_exprs("text")
    rows = {
        r["text"]: r
        for r in df.select(
            "text",
            fp["fp_min"].alias("fp_min"),
            fp["n_shingles"].alias("n_shingles"),
        ).collect()
    }
    assert rows["tiny"]["fp_min"] is None
    assert rows["tiny"]["n_shingles"] == 0
    assert rows["exactly8"]["fp_min"] is not None
    assert rows["exactly8"]["n_shingles"] == 1
