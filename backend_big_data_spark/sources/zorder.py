"""Z-order (Morton-curve) data layout — multi-column locality clustering.

A table filtered on TWO columns can only partition-prune on one of them
with a linear sort; interleaving the bits of both keys (the Morton / Z
curve from the public literature, the same idea behind Delta/Iceberg
Z-ORDER clustering) makes rows close in EITHER dimension land in the same
files, so parquet min/max file skipping prunes range boxes on both columns
at once.

Everything is pure Catalyst integer bit-twiddling — the interleave unrolls
to ``2·bits`` shift/mask/or terms inside whole-stage codegen, and the
layout write is one ``repartitionByRange`` on the code (a range shuffle
that samples the code distribution) + ``sortWithinPartitions``. No UDFs,
no driver work.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(x: Column, mn: float, mx: float, bits: int = 16) -> Column:
    """Scale a numeric column onto the ``[0, 2^bits)`` integer grid (the
    rank space the curve interleaves). Bounds are caller-supplied plan
    constants — at scale they come from table stats, not a data pass."""
    span = mx - mn
    scaled = (x.cast("double") - F.lit(float(mn))) / F.lit(float(span))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * ((1 << bits) - 1)).cast("bigint")


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer columns
    (``a`` on even positions, ``b`` on odd) → the Z-curve position."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(
                F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_layout(
    df: DataFrame,
    code: Column,
    num_files: int,
) -> DataFrame:
    """Cluster ``df`` along the given curve code into ``num_files`` range
    partitions (→ files on write), sorted within each so parquet page
    stats are tight too. ``repartitionByRange`` samples the code
    distribution, so skew in the original columns does not skew files."""
    return df.repartitionByRange(num_files, code.alias("__z")).sortWithinPartitions(
        code.alias("__z")
    )


__all__ = ["morton_code", "quantize", "zorder_layout"]
