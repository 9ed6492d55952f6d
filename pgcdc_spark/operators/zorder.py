"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

Parquet scans prune row groups / files by min-max statistics. A layout
sorted linearly on one column prunes THAT column only; a 100 TB fact
table queried by both ``user_id`` and time needs file stats that are
narrow on BOTH. Interleaving the bits of the (normalized) dimension
values into one Morton key and range-partitioning + sorting on it gives
every file a small hyper-rectangle of the key space — the same layout
``OPTIMIZE ZORDER BY`` computes in lakehouse table formats, built here
from public Spark primitives only:

1. one tiny agg job collects per-column min/max (the normalization box);
2. each row maps to a ``bits``-wide integer per dimension (row-local
   arithmetic, codegen'd — no UDF);
3. bits interleave into one long (an unrolled shift/or expression);
4. EXACT key quantiles (``approxQuantile`` with relativeError=0) become
   explicit split points; each row's bucket maps through a murmur3
   pre-image table so hash partitioning places bucket ``b`` in partition
   ``b`` — a deterministic range exchange, unlike ``repartitionByRange``
   whose reservoir-sampled bounds wobble run-to-run;
5. ``sortWithinPartitions`` on the key + parquet write.

The whole operator is one extra shuffle at write time; reads need no
engine support at all (min-max pruning is already how scans work).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

#: Bits per dimension; 2 dims x 16 bits = 32-bit Morton keys (fits long —
#: morton_key raises if bits * ndims would reach the sign bit).
DEFAULT_BITS = 16


def _normalized(col: str, lo: float, hi: float, bits: int) -> Column:
    """Map ``col`` into [0, 2**bits) by min-max scaling (nulls -> 0).

    The box comes from a pre-collected stats row, so this is pure
    row-local double arithmetic; the cast truncates toward zero and the
    top value clamps to 2**bits - 1."""
    span = hi - lo
    if span <= 0:  # constant column: every row lands in cell 0
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(float(span))
    cell = F.floor(scaled * F.lit(float(2**bits)))
    return F.coalesce(
        F.least(F.greatest(cell, F.lit(0)), F.lit(2**bits - 1)), F.lit(0)
    ).cast("long")


def morton_key(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton (Z-curve) key over ``cols``: bit i of dimension j lands at
    position ``i * len(cols) + j`` of the key. Unrolled into a flat
    OR-of-shifts expression so whole-stage codegen sees plain long ops."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits * ndims = {bits * len(cols)} would reach the long sign "
            f"bit; use bits <= {63 // len(cols)} for {len(cols)} columns"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    ncols = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = _normalized(c, stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return key


def _identity_salts(spark: SparkSession, n: int) -> list[int]:
    """Small ints ``s_0..s_{n-1}`` with ``pmod(hash(s_b), n) == b``.

    ``DataFrame.repartition(n, col)`` places a row in partition
    ``pmod(murmur3(col), n)``; relabeling bucket ``b`` as ``s_b`` before
    the exchange therefore pins bucket ``b`` to partition ``b`` exactly —
    a deterministic identity "range partitioner" built from the public
    hash exchange. Found by one tiny driver-side job over a candidate
    range (murmur3 is a fixed pure function, so the search is stable)."""
    found: dict[int, int] = {}
    lo = 0
    while len(found) < n:
        cand = spark.range(lo, lo + 64 * n).select(
            F.col("id").cast("int").alias("v"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
        ).collect()
        for r in cand:
            found.setdefault(r["p"], r["v"])
        lo += 64 * n
    return [found[b] for b in range(n)]


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    Key quantiles via a Greenwald-Khanna sketch (relativeError=1e-5 —
    the summary is O(1/eps), bounded driver memory at any table size,
    unlike relativeError=0 whose summary retains O(rows) samples) define
    the file boundaries. The sketch is a deterministic function of the
    data and its partitioning, so for a fixed dataset the layout is
    run-to-run deterministic — the property sampled repartitionByRange
    lacked; split-point EXACTNESS is not needed, only stability (a
    slightly uneven file split still prunes identically). The local sort
    tightens row-group stats within the file. Reads prune with ordinary
    min-max statistics — no reader-side cooperation needed."""
    spark = df.sparkSession
    zdf = df.withColumn("__z", morton_key(df, cols, bits))
    splits = sorted(set(zdf.approxQuantile(
        "__z", [i / n_files for i in range(1, n_files)], 1e-5
    )))
    # bucket = number of split points <= z  (0..len(splits))
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + F.when(F.col("__z") > F.lit(int(s)), 1).otherwise(0)
    salts = _identity_salts(spark, len(splits) + 1)
    salt_arr = F.array(*[F.lit(s) for s in salts])
    (
        zdf.withColumn("__zpart", F.element_at(salt_arr, bucket + 1))
        .repartition(len(splits) + 1, "__zpart")
        .sortWithinPartitions("__z")
        .drop("__z", "__zpart")
        .write.mode("overwrite")
        .parquet(path)
    )
