"""Z-order (Morton) curve expressions for multi-dimensional file layout.

A 1-D range-sorted layout (plans/sources.sink_range_sorted_layout) gives
parquet min/max pruning on ONE key and nothing on the others; writing
files along a Z-curve clusters BOTH keys at once, so selective filters on
either dimension skip most files. This is the expression-only equivalent
of Delta OPTIMIZE ZORDER BY — no engine extension, just a computed sort
key + repartitionByRange.

All Catalyst bit-ops (shiftright / bitwise and / shiftleft / sum) — the
z-value of 100 TB is a map-side expression inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16


def to_rank(col: Column, lo: Column, hi: Column) -> Column:
    """Scale a numeric column to an unsigned BITS-bit integer rank over
    [lo, hi] (driver-supplied min/max — at scale these come from catalog
    stats, not a scan)."""
    span = (hi - lo).cast("double")
    unit = (col.cast("double") - lo.cast("double")) / F.when(
        span == 0, F.lit(1.0)
    ).otherwise(span)
    max_rank = F.lit((1 << BITS) - 1)
    return F.least(
        max_rank, F.floor(unit * max_rank + F.lit(0.5)).cast("bigint")
    ).cast("bigint")


def interleave2(a: Column, b: Column) -> Column:
    """Morton-interleave two BITS-bit ranks: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1. 2*BITS terms of shift/and/or —
    constant-folded into one codegen expression."""
    return interleave_n([a, b])


def interleave_n(ranks: list[Column]) -> Column:
    """Morton-interleave k ranks (k*per_dim_bits ≤ 62 so the z-value
    stays a positive bigint): bit i of rank j lands at position
    k*i + j — the general Z-curve, so a selective filter on ANY of the
    k clustered dimensions prunes files. Per-dimension resolution
    shrinks as k grows (62//k bits, e.g. 4 dims → 15 bits ≈ 32k cells
    per dim), which is the standard Z-order trade: more clustered
    columns, coarser clustering per column — the reason Delta
    recommends Z-ordering on few columns. All shift/and/add terms stay
    inside whole-stage codegen."""
    k = len(ranks)
    if k < 2:
        raise ValueError(f"interleave_n needs >= 2 ranks, got {k}")
    per_dim = min(BITS, 62 // k)
    z = F.lit(0).cast("bigint")
    for i in range(per_dim):
        for j, r in enumerate(ranks):
            # drop rank bits above per_dim by sampling the TOP per_dim
            # bits (ranks are BITS-bit; shifting keeps the significant
            # end so coarser grids stay order-preserving)
            bit = F.shiftrightunsigned(
                r, i + (BITS - per_dim)
            ).bitwiseAND(F.lit(1).cast("bigint"))
            z = z + F.shiftleft(bit, k * i + j)
    return z
