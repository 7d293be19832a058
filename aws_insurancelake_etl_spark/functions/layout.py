"""Multi-dimensional data-layout functions: Morton (z-order) codes.

A range-partitioned sort optimizes pruning for ONE key; interleaving the
bits of two keys (the z-order curve) gives every output file a bounded
min/max range on BOTH columns, so footer statistics prune scans filtered
on either dimension — the technique behind lakehouse `OPTIMIZE ZORDER BY`
(Delta/Iceberg), here as a plain column expression usable with
``repartitionByRange`` + ``sortWithinPartitions`` on any parquet table.

The bit interleave is a fixed expression tree of shifts/masks — fully
codegen'd, no UDF — and the same arithmetic is expressible in any engine
for differential checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns:
    ``a``'s bit i lands at position 2i, ``b``'s at 2i+1.  Values are
    masked to ``bits`` first, so out-of-range inputs wrap instead of
    colliding across dimensions."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    total = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        total = total + abit + bbit
    return total
