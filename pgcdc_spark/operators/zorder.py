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
4. ``repartitionByRange`` on the key (range exchange with sampled
   bounds) + ``sortWithinPartitions`` + parquet write.

The whole operator is one extra shuffle at write time; reads need no
engine support at all (min-max pruning is already how scans work).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Bits per dimension; 2 dims x 20 bits = 40-bit Morton keys (fits long).
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


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    ``repartitionByRange`` gives each output file a contiguous key range
    (hyper-rectangle-ish region of the dimension space), and the local
    sort tightens row-group stats within the file. Reads prune with
    ordinary min-max statistics — no reader-side cooperation needed."""
    key = morton_key(df, cols, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
