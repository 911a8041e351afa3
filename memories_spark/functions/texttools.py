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


def word_shingles_expr(text: str | Column, n: int) -> Column:
    """Distinct n-word shingles ('a b c') from the token stream.

    Used by MinHash/Jaccard dedup. Left in token order before
    dedup; output is the distinct set (array_distinct keeps first
    occurrence, but consumers treat it as a set).
    """
    toks = tokens_expr(text)
    count = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(0)))
    shingle = lambda i: F.concat_ws(" ", F.slice(toks, i, n))  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle))


def char_shingles_expr(text: str | Column, n: int) -> Column:
    """Distinct n-char shingles over the lowercased text."""
    text = F.col(text) if isinstance(text, str) else text
    low = F.lower(text)
    count = F.length(low) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(low, i, n)))
