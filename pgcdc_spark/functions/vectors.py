"""Vector algebra over ``array<float>`` embedding columns — JVM-side only.

Everything here compiles to Catalyst higher-order functions (zip_with /
aggregate): no Python UDFs, no serialization boundary, whole-stage codegen
applies. Arithmetic is done in double with a sequential left-fold so
results are bit-deterministic (and match DuckDB's list_dot_product on
DOUBLE[] casts, which also sums sequentially — verified).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """dot / (sqrt(|a|^2) * sqrt(|b|^2)) — exact expression shape matters
    for cross-engine parity; keep in sync with oracle SQL."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))
