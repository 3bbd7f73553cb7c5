"""Vector (embedding) column expressions over ``array<float>`` columns.

Pure built-in higher-order functions (``zip_with`` / ``aggregate``) — JVM
expressions, no Python UDF, so a 100 TB embedding table streams through
whole-stage codegen. Elements are promoted to double *first* so the
sequential fold is bit-identical to a single-node oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def idot(a: Column, b: Column) -> Column:
    """Exact integer dot product for quantized (integral) vectors.

    BIGINT fold — no floating point anywhere, so the result is
    order-independent and engine-portable (DuckDB's ``list_dot_product``
    on BIGINT lists matches bit-for-bit)."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
