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


def dot_unrolled(a: Column, b: Column, dims: int) -> Column:
    """Dot product unrolled to a static expression for a known fixed dim.

    zip_with/aggregate lambdas are CodegenFallback (interpreted per element,
    allocation-heavy — measurably GC-sensitive in long sessions); a
    left-associated sum of element_at products compiles under whole-stage
    codegen and evaluates in the same order as the sequential fold, so
    results stay bit-identical to ``dot`` (and to DuckDB's
    list_dot_product). Use on the hot path whenever the dimension is known.
    """
    ad, bd = as_double(a), as_double(b)
    out = F.element_at(ad, 1) * F.element_at(bd, 1)
    for i in range(2, dims + 1):
        out = out + F.element_at(ad, i) * F.element_at(bd, i)
    return out


def norm_unrolled(a: Column, dims: int) -> Column:
    """L2 norm via ``dot_unrolled`` — bit-identical to sqrt(norm_sq(a))."""
    return F.sqrt(dot_unrolled(a, a, dims))


def dot_unrolled_expr(a: str, b: str, dims: int, cast: bool = True) -> Column:
    """``dot_unrolled`` built as ONE parsed SQL string from column NAMES.

    The py4j variant above constructs ~4*dims JVM expression nodes via
    round-trips (~1s of driver time per plan at dims=64); parsing a single
    generated string costs milliseconds and yields the same left-associated
    element_at/multiply/add tree, so results stay bit-identical.

    ``cast=False`` requires the inputs to ALREADY be ``array<double>``.
    Use that on pair-level hot paths (joins): a textual per-term CAST is a
    separate node per term, which interpreted eval re-executes — O(dims^2)
    array casts per pair. Pre-cast once per ROW in the select before the
    join instead (float->double is exact, so results are unchanged).
    """
    fmt = "CAST({c} AS ARRAY<DOUBLE>)" if cast else "{c}"
    ad, bd = fmt.format(c=a), fmt.format(c=b)
    terms = " + ".join(
        f"element_at({ad}, {i}) * element_at({bd}, {i})"
        for i in range(1, dims + 1)
    )
    return F.expr(terms)


def norm_unrolled_expr(a: str, dims: int, cast: bool = True) -> Column:
    """L2 norm from a column name — bit-identical to ``norm_unrolled``."""
    return F.sqrt(dot_unrolled_expr(a, a, dims, cast=cast))


def dot_fold_expr(a: str, b: str, cast: bool = False) -> Column:
    """Sequential-fold dot product as one tiny parsed expression — THE hot-path
    form.

    Measured on local[32] (pyspark 4.1): the higher-order fold matches the
    unrolled form's throughput (~50 ns/row at dims=64) in a clean session,
    and unlike it stays fast in long many-query sessions: the unrolled
    variant generates a >8 KB-bytecode method that HotSpot refuses to JIT
    (-XX:DontCompileHugeMethods), so whole queries intermittently run on
    interpreted bytecode at ~60 us/pair. The fold's generated code is a few
    lines, always JIT-able, and its plan parses in microseconds.

    Fold order is left-to-right with a 0.0 seed — bit-identical to the
    unrolled left-associated sum and to DuckDB's list_dot_product on
    DOUBLE[] (verified by the oracle gate). With ``cast=False`` inputs must
    already be array<double>: zip_with multiplies in the ELEMENT type, so
    float inputs would lose precision before the widening.
    """
    if cast:
        a, b = f"CAST({a} AS ARRAY<DOUBLE>)", f"CAST({b} AS ARRAY<DOUBLE>)"
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


def norm_fold_expr(a: str, cast: bool = False) -> Column:
    """L2 norm from a column name via ``dot_fold_expr`` — hot-path form."""
    return F.sqrt(dot_fold_expr(a, a, cast=cast))
