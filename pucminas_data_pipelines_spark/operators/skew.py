"""Skew mitigation: salted equi-join.

AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first line of
defense and needs no code; this operator is the explicit fallback for
joins AQE can't fix — e.g. a hot key whose rows must still meet every
matching row of the other side (splitting the partition doesn't help when
one *key* exceeds an executor), or engines/paths with AQE disabled.

Shape: the skewed (large) side gets a deterministic salt in [0, factor)
derived from non-key columns, widening one hot key into ``factor`` shuffle
keys; the small side is replicated ×factor so every (key, salt) bucket
still sees all matches. Equivalent to the plain inner equi-join on the key
(verified by test_skew.py), at the cost of replicating the build side —
so ``factor`` should be ~(hot-key rows / target partition rows), not huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_inner_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    factor: int = 8,
    salt_from: str | None = None,
) -> DataFrame:
    """Inner equi-join ``skewed ⋈ other ON skewed[on] == other[on]`` with
    the shuffle salted ×factor.

    ``salt_from``: a column of ``skewed`` whose hash spreads the salt
    (defaults to a per-partition monotonic id — deterministic for a fixed
    input layout, and never requires a non-deterministic rand()).

    Returns the joined DataFrame with ``other``'s duplicate key column and
    the salt columns dropped.
    """
    if factor < 1:
        # factor 0 would replicate the build side zero times (explode of
        # an empty array drops every row) and the join would silently
        # return EMPTY — refuse loudly
        raise ValueError(f"factor={factor} must be >= 1")
    salt_src = (
        F.xxhash64(F.col(salt_from))
        if salt_from is not None
        else F.monotonically_increasing_id()
    )
    left = skewed.withColumn("_salt", F.pmod(salt_src, F.lit(factor)).cast("int"))
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    ).withColumnRenamed(on, "_rk")
    joined = left.join(
        right, (F.col(on) == F.col("_rk")) & (left["_salt"] == right["_salt"])
    )
    return joined.drop("_salt").drop("_rk")
