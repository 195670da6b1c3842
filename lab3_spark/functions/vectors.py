"""Vector expressions over ``array<float/double>`` columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``) —
JVM-side, no UDF, no shuffle.  Used by similarity search and
embedding-cosine dedup (embeddings table: ``embedding array<float>``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (double) of two array columns."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; 0-norm guarded to NULL."""
    a, b = _col(a), _col(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)


def unit_vector(a: Column | str) -> Column:
    """v / ||v|| as array<double> — precompute ONCE per row before a
    pairwise self-join so each pair needs a single fold (dot of unit
    vectors) instead of three (dot + two norms).  Higher-order-function
    lambdas are interpreted, not codegen'd, so per-pair fold count is
    the dominant cost of vector similarity at any scale."""
    a = _col(a)
    n = l2_norm(a)
    # 0-norm guarded to NULL (not a DIVIDE_BY_ZERO under ANSI mode),
    # mirroring cosine_similarity: a NULL unit vector NULLs any dot
    # it joins into, and a NULL cos fails every >= threshold filter
    return F.when(n != 0, F.transform(a, lambda x: x.cast("double") / n))
