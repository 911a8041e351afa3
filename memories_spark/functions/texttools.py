"""Tokenization / shingling expressions.

The reference tokenizes with ``text.lower().split()`` for BM25
(reference memory_engine.py:224-232) — i.e. split on runs of
whitespace, dropping empties. These helpers reproduce that as pure
Catalyst expressions so tokenization stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_expr(text: str | Column) -> Column:
    """``lower().split()`` semantics: array of non-empty tokens."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")


TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim({col})), '\\s+'), t -> t != '')"
)


def tokens_sql(col: str) -> str:
    """DuckDB mirror of :func:`tokens_expr`."""
    return TOKENS_SQL.format(col=col)


def bounded_seq(n: int | Column) -> Column:
    """``sequence(1, n)`` that is EMPTY (not ``[1, 0]``) when n < 1.

    Spark's ``sequence(start, stop)`` auto-selects step -1 when
    stop < start, so the widespread exploder idiom
    ``sequence(1, greatest(n, 0))`` yields the DESCENDING array
    ``[1, 0]`` for n = 0: ``slice(..., 0, ...)`` then throws
    INVALID_PARAMETER_VALUE.START at runtime, and substr/window
    consumers silently fabricate rows — on any document shorter
    than the n-gram width. This guard mirrors DuckDB's
    ``range(1, n + 1)`` / ``generate_series`` semantics (empty when
    n < 1), which is what every inline SQL oracle already computes.
    Use this for EVERY 1..n position enumeration whose bound can
    reach 0.
    """
    n = F.lit(n) if isinstance(n, int) else n
    n = n.cast("int")
    return F.when(n >= F.lit(1), F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def word_shingles_expr(text: str | Column, n: int) -> Column:
    """Distinct n-word shingles ('a b c') from the token stream.

    Used by MinHash/Jaccard dedup. Left in token order before
    dedup; output is the distinct set (array_distinct keeps first
    occurrence, but consumers treat it as a set). Documents with
    fewer than ``n`` tokens yield the EMPTY set (bounded_seq), not
    a crash.
    """
    toks = tokens_expr(text)
    idx = bounded_seq(F.size(toks) - F.lit(n - 1))
    shingle = lambda i: F.concat_ws(" ", F.slice(toks, i, n))  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle))


def char_shingles_expr(text: str | Column, n: int) -> Column:
    """Distinct n-char shingles over the lowercased text.

    Text shorter than ``n`` chars yields the EMPTY set (previously
    only array_distinct accidentally absorbed the duplicate)."""
    text = F.col(text) if isinstance(text, str) else text
    low = F.lower(text)
    idx = bounded_seq(F.length(low) - F.lit(n - 1))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(low, i, n)))
