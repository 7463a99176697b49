"""Interval-overlap join without an equi key.

Spark plans a bare overlap predicate (a.start < b.end AND b.start < a.end)
as a BroadcastNestedLoopJoin — O(|A|·|B|) comparisons, a scale-killer the
moment neither side fits in memory. The classic fix (used by spatial and
genomics engines, and the same find→verify shape as LSH dedup) is bucket
decomposition: explode every interval into the fixed-width time buckets it
touches, equi-join on bucket id, then verify the exact overlap predicate
and de-duplicate pairs that co-occur in several buckets.

Cost model: with bucket width ~= the typical interval length, each
interval lands in ~2 buckets and candidate pairs are confined to
same-bucket neighbors, so the join is linear-ish in overlaps rather than
quadratic in rows. Skewed buckets (one hot week) split under AQE; for
long-tailed interval lengths, pick the width near the MEDIAN length and
let outliers explode into more buckets — correctness never depends on the
width, only cost does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str, str],
    right_cols: tuple[str, str, str],
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """All (left, right) pairs whose half-open intervals [start, end)
    overlap. ``left_cols`` / ``right_cols`` are (id, start_ts, end_ts);
    returns (left id, right id, overlap_seconds) with the input id column
    names preserved.

    Both sides shuffle ONLY on bucket id; the exact predicate runs on
    same-bucket candidates. dropDuplicates on the id pair removes
    multi-bucket co-occurrences (an overlapping pair is seen once per
    shared bucket).
    """
    if bucket_seconds < 1:
        # bucket width 0 divides by zero in the bucket-id expression
        # (an ANSI error at best, NULL buckets silently dropping every
        # row at worst) — refuse loudly
        raise ValueError(f"bucket_seconds={bucket_seconds} must be >= 1")
    l_id, l_start, l_end = left_cols
    r_id, r_start, r_end = right_cols

    def bucketed(df: DataFrame, id_c: str, s: str, e: str, tag: str) -> DataFrame:
        # Degenerate rows (end <= start) denote EMPTY half-open intervals,
        # which contain no instant and therefore overlap nothing — drop
        # them here. Without this, the overlap predicate (which assumes
        # start < end on both sides) lets an empty [t, t) pair with
        # overlap_seconds=0 and an inverted interval pair with a negative
        # overlap.
        df = df.where(F.col(s) < F.col(e))
        sec = F.unix_timestamp(F.col(s))
        # half-open: an interval ending exactly on a bucket boundary does
        # not touch that bucket
        end_sec = F.unix_timestamp(F.col(e)) - F.lit(1)
        return df.select(
            F.col(id_c),
            F.col(s).alias(f"_{tag}s"),
            F.col(e).alias(f"_{tag}e"),
            F.explode(
                F.sequence(
                    F.floor(sec / F.lit(bucket_seconds)),
                    F.floor(end_sec / F.lit(bucket_seconds)),
                )
            ).alias("_bk"),
        )

    lb = bucketed(left, l_id, l_start, l_end, "l")
    rb = bucketed(right, r_id, r_start, r_end, "r")
    overlap: Column = (F.col("_ls") < F.col("_re")) & (
        F.col("_rs") < F.col("_le")
    )
    overlap_seconds = (
        F.least(F.unix_timestamp("_le"), F.unix_timestamp("_re"))
        - F.greatest(F.unix_timestamp("_ls"), F.unix_timestamp("_rs"))
    ).cast("bigint")
    return (
        lb.join(rb, "_bk")
        .where(overlap)
        .select(l_id, r_id, overlap_seconds.alias("overlap_seconds"))
        .dropDuplicates([l_id, r_id])
    )
