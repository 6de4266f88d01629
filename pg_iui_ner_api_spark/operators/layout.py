"""Z-order (Morton) data layout — multi-dimensional scan pruning.

At 100 TB the dominant cost of every query is the scan, and the scan's
cost is decided by LAYOUT: parquet row-group min/max statistics prune
only when rows with similar key values sit in the same files. Sorting
clusters ONE column; a corpus queried by several (entity id AND time,
part AND supplier) needs multi-dimensional clustering — the z-order
curve, which interleaves the bits of the dimensions so points close in
EVERY dimension land close on the curve (the same technique Delta
Lake's OPTIMIZE ZORDER and Iceberg's sort-order rewrite apply).

``zorder_key`` is pure JVM Column algebra — the classic magic-number
bit-spread (no UDF, no shuffle of its own), bit-identical in DuckDB
(``& | << >>`` on BIGINT), so the key itself is oracle-checkable.
``zorder_layout`` range-partitions on the key and sorts within
partitions: one shuffle, after which every output file covers a small
hyper-rectangle of the key space and min/max pruning works on ALL
z-ordered dimensions at once.

Inputs are clamped to ``bits`` (default 16) low bits per dimension —
the caller maps raw values into that range first (quantile rank,
epoch-hour, hash prefix); clamping is explicit, never silent
truncation of semantics (the un-clamped columns ride along untouched).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 16-bit spread masks: x -> x with a zero bit interleaved after every
# bit (result fits 32 bits); two spread values OR-ed one shift apart
# form the 32-bit Morton code.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(x: Column, y: Column) -> Column:
    """Morton interleave of the low 16 bits of two non-negative int
    columns: bit i of ``x`` lands at position 2i, bit i of ``y`` at
    2i+1. Monotone per dimension within each power-of-2 block — the
    property min/max pruning exploits."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    partitions: int,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster ``df`` on the z-curve of (x, y): ONE range shuffle on the
    Morton key + an in-partition sort, so each output partition (and
    the files written from it) covers a compact rectangle of the
    (x, y) space. Write the result with ``.write.parquet`` and both
    dimensions prune."""
    keyed = df.withColumn(key_col, zorder_key(F.col(x), F.col(y)))
    return keyed.repartitionByRange(partitions, key_col).sortWithinPartitions(
        key_col
    )
