"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Parquet scans prune row groups / files whose column min-max statistics
exclude the predicate.  A layout sorted on ONE column gives perfect
skipping on that column and none on any other; interleaving the bits of
two (or more) key columns into a single Morton code and sorting by it
gives each file a small rectangle in (a, b) space — predicates on
EITHER dimension skip most files.  This is the same layout decision as
bucketing/date-partitioning in sources/layout.py: paid once at write
time, free for every later scan.  (The reference engine rescans a flat
buffer per run — phoenixLab/wordCount/wordCount.cpp:116-133 — and has
no layout surface at all; this is the cluster-scale answer.)

All arithmetic is integer (shift/mask/or folded into one Catalyst
expression), so a SQL oracle reproduces the codes bit-for-bit:

1. fixed-point bucketize each dimension to ``bits`` bits using GLOBAL
   min/max (a 1-row broadcast aggregate — two-pass, like every
   stats-dependent layout build);
2. interleave: bit i of a → bit 2i, bit i of b → bit 2i+1.

The z-value is a WRITE-TIME sort key — queries never see it; skipping
shows up purely as fewer row groups read (tests/test_zorder.py measures
per-file min-max rectangles via pyarrow footers on both layouts).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def bucketize_fixed(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale ``col`` into the integer range [0, 2^bits - 1] given global
    min/max columns — floor fixed-point, the cross-engine-exact choice
    (HALF_UP rounding differs between engines; floor never does).
    Degenerate ranges (hi == lo) map to 0."""
    n_cells = (1 << bits) - 1
    span = hi - lo
    scaled = F.when(
        span > 0, F.floor((col - lo) / span * n_cells).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    # clamp: col == hi lands exactly on n_cells, keep it in range
    return F.least(scaled, F.lit(n_cells).cast("bigint"))


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton code of two ``bits``-wide non-negative ints: bit i of
    ``a`` goes to bit 2i, bit i of ``b`` to bit 2i+1.  A fold of
    2*bits shift/mask/or terms — whole-stage-codegen'd, no UDF."""
    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    terms = []
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(one)
        bit_b = F.shiftright(b, i).bitwiseAND(one)
        terms.append(F.shiftleft(bit_a, 2 * i))
        terms.append(F.shiftleft(bit_b, 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms, zero)


def with_z_value(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "z",
) -> DataFrame:
    """Add the Morton code of (col_a, col_b), bucketized to ``bits``
    bits each against their GLOBAL min/max (computed as a 1-row
    broadcast aggregate — the only extra pass a z-order write costs)."""
    stats = df.agg(
        F.min(col_a).cast("double").alias("_lo_a"),
        F.max(col_a).cast("double").alias("_hi_a"),
        F.min(col_b).cast("double").alias("_lo_b"),
        F.max(col_b).cast("double").alias("_hi_b"),
    )
    qa = bucketize_fixed(
        F.col(col_a).cast("double"), F.col("_lo_a"), F.col("_hi_a"), bits
    )
    qb = bucketize_fixed(
        F.col(col_b).cast("double"), F.col("_lo_b"), F.col("_hi_b"), bits
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, interleave_bits(qa, qb, bits))
        .drop("_lo_a", "_hi_a", "_lo_b", "_hi_b")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Materialize ``df`` as parquet clustered on the (col_a, col_b)
    Morton curve: range-repartition by z (each output file covers a
    contiguous z-range = a small rectangle in key space), sort within
    partitions so row groups inside a file are tight too, drop the
    helper column at write."""
    z = with_z_value(df, col_a, col_b, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("z"))
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
