"""Vector math as JVM-side Catalyst expressions (no Python UDFs).

The reference stores 384-d L2-normalized float32 embeddings and
ranks by cosine (reference onnx_embedder.py:140-146,
qdrant_store.py:90-96). Here embeddings are ``array<float>`` columns
and every vector op is a higher-order-function expression that runs
inside whole-stage codegen — this is the difference between a scan
that streams through the JVM at full speed and one that round-trips
every row through Python.

Determinism note: ``aggregate(...)`` folds the array **left to
right**, so a dot product is the left-associated sum chain
``((x1*y1 + x2*y2) + x3*y3) + ...`` — bit-for-bit reproducible and
mirrorable by any engine that evaluates an explicit ``a+b+c`` chain
(the DuckDB oracle does exactly that).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Left-fold dot product of two array<numeric> columns, in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: str | Column) -> Column:
    """L2 norm of an array<numeric> column, in double."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity = dot / (|a| * |b|); NaN-safe for zero vectors."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def dot_sql(a: str, b: str, dim: int) -> str:
    """Explicit left-associated dot-product SQL chain (oracle mirror).

    Generates ``a[1]*b[1] + a[2]*b[2] + ...`` — the same fold order as
    :func:`dot_expr`, so a DuckDB oracle evaluating it gets the exact
    IEEE-754 double Spark produces.
    """
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE)*CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )
    return f"({terms})"


def norm_sql(a: str, dim: int) -> str:
    """Explicit L2-norm SQL chain matching :func:`norm_expr`."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE)*CAST({a}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )
    return f"sqrt({terms})"


def cosine_sql(a: str, b: str, dim: int) -> str:
    """Cosine-similarity SQL chain matching :func:`cosine_expr`."""
    return f"({dot_sql(a, b, dim)} / ({norm_sql(a, dim)} * {norm_sql(b, dim)}))"
