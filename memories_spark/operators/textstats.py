"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

These are the corpus-hygiene operators a 100 TB text pipeline runs
before anything else. All pure Catalyst expressions (regex + arrays)
— a full-corpus pass is one scan with no shuffle except the final
aggregate, and every score is reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_expr

# tiny deterministic stopword lists per language (marker words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "de", "que", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "zh": (),  # no-space script: marker approach does not apply
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("it", "that", "this", "for", "on", "with")

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def lang_scores_expr(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    """Per-language marker-hit ratio over the token stream.

    Pass a pre-tokenized ``toks`` column when combining several text
    operators in one projection: tokenization is a regex pass over
    the full text, and inlining it per-language makes the scan
    re-split every row N times (codegen CSEs a bound column
    reference, not N copies of the higher-order expression).
    """
    toks = tokens_expr(text_col) if toks is None else toks
    n = F.greatest(F.size(toks), F.lit(1))
    def _matcher(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    out = {}
    for lang, markers in LANG_MARKERS.items():
        if not markers:
            continue
        hits = F.size(F.filter(toks, _matcher(markers)))
        out[lang] = hits.cast("double") / n.cast("double")
    return out


def predict_lang_expr(text_col: str, toks: Column | None = None) -> Column:
    """Argmax language over marker ratios; ties break alphabetically;
    all-zero -> 'unknown'."""
    scores = lang_scores_expr(text_col, toks)
    pairs = F.array(
        *[F.struct(score.alias("s"), F.lit(lang).alias("l")) for lang, score in sorted(scores.items())]
    )
    # max by (score, reversed-lang) so that ties pick the alphabetically first lang
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1.0).alias("s"), F.lit("~").alias("l")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]), x
        ).otherwise(acc),
    )
    return F.when(best["s"] <= 0.0, F.lit("unknown")).otherwise(best["l"])


def predict_lang_sql(text_col: str) -> str:
    """DuckDB mirror of :func:`predict_lang_expr` (same tie rules:
    first language in sorted order wins ties because later langs only
    replace on strictly-greater score)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'), t -> t != '')"
    )
    cases = []
    for lang in sorted(l for l, m in LANG_MARKERS.items() if m):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        ratio = (
            f"CAST(len(list_filter({toks}, t -> t IN ({markers}))) AS DOUBLE)"
            f" / greatest(len({toks}), 1)"
        )
        cases.append((lang, ratio))
    # emulate the left-fold argmax: keep first-in-sorted-order on ties
    expr = "STRUCT_PACK(s := -1.0, l := '~')"
    for lang, ratio in cases:
        expr = (
            f"(CASE WHEN ({ratio}) > ({expr}).s"
            f" THEN STRUCT_PACK(s := ({ratio}), l := '{lang}') ELSE ({expr}) END)"
        )
    return f"(CASE WHEN ({expr}).s <= 0.0 THEN 'unknown' ELSE ({expr}).l END)"


def quality_features(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    """Deterministic quality signals: token count, avg token length,
    stopword ratio, punctuation ratio, digit ratio."""
    toks = tokens_expr(text_col) if toks is None else toks
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col) if isinstance(text_col, str) else text_col)
    total_tok_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    low = F.lower(F.col(text_col))
    n_punct = F.length(F.regexp_replace(low, "[a-z0-9 ]", ""))
    n_digit = F.length(F.regexp_replace(low, "[^0-9]", ""))
    safe_n = F.greatest(n_toks, F.lit(1)).cast("double")
    return {
        "n_tokens": n_toks.cast("long"),
        "avg_token_len": total_tok_len.cast("double") / safe_n,
        "stopword_ratio": stop_hits.cast("double") / safe_n,
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        "digit_ratio": n_digit.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
    }


def quality_score_expr(text_col: str, toks: Column | None = None) -> Column:
    """Composite quality in [0,1]-ish: rewards stopword presence and
    moderate token length, penalizes punctuation/digit noise.
    Fixed weights — a stand-in for a trained classifier, same shape
    as Gopher/C4-style rule filters."""
    f = quality_features(text_col, toks)
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 1000), 1.0).otherwise(0.5)
    return (
        F.lit(0.4) * length_ok
        + F.lit(0.3) * F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(f["punct_ratio"] * 10.0, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(f["digit_ratio"] * 10.0, F.lit(1.0)))
    )


def quality_score_sql(text_col: str) -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'), t -> t != '')"
    )
    stop = ", ".join(f"'{m}'" for m in EN_STOPWORDS)
    n_toks = f"len({toks})"
    safe_n = f"CAST(greatest({n_toks}, 1) AS DOUBLE)"
    stop_ratio = f"(CAST(len(list_filter({toks}, t -> t IN ({stop}))) AS DOUBLE) / {safe_n})"
    n_chars = f"greatest(length({text_col}), 1)"
    punct_ratio = (
        f"(CAST(length(regexp_replace(lower({text_col}), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / CAST({n_chars} AS DOUBLE))"
    )
    digit_ratio = (
        f"(CAST(length(regexp_replace(lower({text_col}), '[^0-9]', '', 'g')) AS DOUBLE)"
        f" / CAST({n_chars} AS DOUBLE))"
    )
    length_ok = f"(CASE WHEN {n_toks} >= 10 AND {n_toks} <= 1000 THEN 1.0 ELSE 0.5 END)"
    return (
        f"(0.4 * {length_ok}"
        f" + 0.3 * least({stop_ratio} * 4.0, 1.0)"
        f" + 0.2 * (1.0 - least({punct_ratio} * 10.0, 1.0))"
        f" + 0.1 * (1.0 - least({digit_ratio} * 10.0, 1.0)))"
    )


def token_counts(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    """Whitespace token count + BPE-ish sub-token count (regex over
    the lowercased text)."""
    return {
        "ws_tokens": F.size(tokens_expr(text_col) if toks is None else toks).cast("long"),
        "bpe_ish_tokens": F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN)).cast("long"),
    }


def token_counts_sql(text_col: str) -> dict[str, str]:
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'), t -> t != '')"
    )
    return {
        "ws_tokens": f"CAST(len({toks}) AS BIGINT)",
        "bpe_ish_tokens": (
            f"CAST(len(regexp_extract_all(lower({text_col}), '{BPE_ISH_PATTERN}')) AS BIGINT)"
        ),
    }


FINGERPRINT_NGRAM = 8


def fingerprint_exprs(text_col: str) -> dict[str, Column]:
    """Winnowing-lite document fingerprint: min/max md5 over the
    8-char shingle set + distinct-shingle count. Two docs sharing the
    min-hash fingerprint are near-dup candidates (MOSS-style)."""
    from memories_spark.functions.texttools import bounded_seq

    low = F.lower(F.col(text_col))
    # bounded_seq: text shorter than the shingle width yields the EMPTY
    # hash set (null fp, 0 shingles) exactly like the DuckDB twin's
    # range(1, count + 1); sequence(1, 0) fabricated a duplicate hash
    # of the truncated text via the [1, 0] descending array
    idx = bounded_seq(F.length(low) - F.lit(FINGERPRINT_NGRAM - 1))
    hashes = F.transform(idx, lambda i: F.md5(F.substring(low, i, FINGERPRINT_NGRAM)))
    return {
        "fp_min": F.array_min(hashes),
        "fp_max": F.array_max(hashes),
        "n_shingles": F.size(F.array_distinct(hashes)).cast("long"),
    }


def fingerprint_sql(text_col: str) -> dict[str, str]:
    low = f"lower({text_col})"
    count = f"greatest(length({low}) - {FINGERPRINT_NGRAM - 1}, 0)"
    hashes = (
        f"list_transform(range(1, {count} + 1), i -> md5(substr({low}, CAST(i AS INT), {FINGERPRINT_NGRAM})))"
    )
    return {
        "fp_min": f"list_aggregate({hashes}, 'min')",
        "fp_max": f"list_aggregate({hashes}, 'max')",
        "n_shingles": f"CAST(len(list_distinct({hashes})) AS BIGINT)",
    }
