"""Vector math over ``array<float>`` embedding columns — pure expressions.

Used by the similarity-search and embedding-dedup operators. All folds are
sequential left-folds in double precision so results are bit-reproducible
(and identical to a DuckDB oracle using the same fold order).

At 100 TB these stay per-row / codegen; for very hot paths a Pandas-UDF
numpy variant is provided in operators/similarity_search.py (Arrow-batched,
BLAS dot products), semantics identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector (zero vectors pass through unchanged).

    Division by the norm is a per-element IEEE op — bit-identical across
    engines given the identical fold-order norm above.
    """
    n = norm(a)
    return F.when(n == 0, to_double(a)).otherwise(
        F.transform(to_double(a), lambda x: x / n)
    )


def quantize_int8(a: Column) -> Column:
    """Symmetric int8 quantization: scale by 127/max|x|, round half-up via
    ``floor(x·s + 0.5)`` (floor is exact; engines' ``round()`` differ on
    representation edges, so it is avoided). All-zero vectors quantize to
    zeros. Returns ``array<int>`` in [-127, 127].

    The storage operator of an embedding pipeline: 4× smaller index, and
    the scale factor is recoverable per-row as ``max|x|/127``.
    """
    m = F.array_max(F.transform(to_double(a), F.abs))
    s = F.lit(127.0) / m
    return F.when(m == 0, F.transform(a, lambda x: F.lit(0))).otherwise(
        F.transform(to_double(a), lambda x: F.floor(x * s + F.lit(0.5)).cast("int"))
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(to_double(a), to_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
