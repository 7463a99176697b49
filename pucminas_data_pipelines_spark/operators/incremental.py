"""Incremental materialized-view maintenance: refresh a grouped rollup
from a CDC change set instead of recomputing it from the base table —
the continuous-aggregate idea (TimescaleDB caggs, Materialize, Delta
Live Tables) on the versioned-table surface (reference O15's two
readable endpoints make the change set derivable; operators/upsert.py
``version_diff``).

COUNT and SUM are self-maintainable aggregates: every change row carries
enough information to adjust the rollup (+row for insert/update_postimage,
−row for delete/update_preimage), so a refresh costs O(|changes|) plus a
join against the dimension-sized rollup — never a rescan of the base
table. Combined with version_diff's manifest fast path (diff reads only
CHANGED buckets), maintaining a segment-level balance rollup over a
100 TB customer table costs the changed buckets + the rollup, while the
naive recompute scans everything. MIN/MAX are deliberately absent: they
are not self-maintainable under deletes (a retracted maximum needs a
rescan of its group) — the caller recomputes those groups or uses the
full rollup.

Sums run in DECIMAL internally (exact, order-insensitive) so the
incremental result is bit-identical to a from-scratch recompute — the
differential test and the driver oracle both rely on that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_from_scratch(
    base: DataFrame, group_cols: list[str], sum_col: str
) -> DataFrame:
    """The batch definition of the maintained view: per-group row count
    and exact DECIMAL sum. ``apply_rollup_delta`` must keep any rollup
    equal to this recomputed on the post-change base (pinned by test and
    by the driver oracle)."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(sum_col)).alias("n_vals"),  # non-NULL measure rows
        F.sum(F.col(sum_col).cast("decimal(18,2)")).alias("total"),
    )


def apply_rollup_delta(
    rollup: DataFrame, diff: DataFrame, group_cols: list[str], sum_col: str
) -> DataFrame:
    """Apply a ``version_diff`` change set to a (group → n, total)
    rollup: inserts and update postimages add, deletes and update
    preimages retract; groups whose count reaches zero vanish (matching
    what a recompute would produce); groups first seen in the delta
    appear. NULL group keys are legal and matched null-safely — groupBy
    keeps them as real groups, so the maintenance join must too.

    Scale: one aggregate over the change set (map-side combined) plus a
    full-outer join against the rollup — both sides are group-cardinality
    or change-sized, the base table is never touched."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = diff.groupBy(*group_cols).agg(
        F.sum(sign).alias("_dn"),
        # non-NULL measure adjustments: an all-NULL group's total must
        # stay NULL (as a recompute would emit), not 0.00 — n_vals
        # tracks how many non-NULL measures the group holds
        F.sum(
            F.when(F.col(sum_col).isNotNull(), sign).otherwise(F.lit(0))
        ).alias("_dnv"),
        F.sum(
            sign.cast("decimal(18,2)") * F.col(sum_col).cast("decimal(18,2)")
        ).alias("_dsum"),
    )
    r = rollup.alias("r")
    d = delta.alias("d")
    cond = None
    for c in group_cols:
        eq = F.col(f"r.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = eq if cond is None else (cond & eq)
    zero = F.lit(0).cast("decimal(18,2)")
    n_vals = F.coalesce(F.col("r.n_vals"), F.lit(0)) + F.coalesce(
        F.col("d._dnv"), F.lit(0)
    )
    raw_total = (
        F.coalesce(F.col("r.total"), zero) + F.coalesce(F.col("d._dsum"), zero)
    ).cast("decimal(18,2)")
    merged = r.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"r.{c}"), F.col(f"d.{c}")).alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(F.col("r.n"), F.lit(0))
            + F.coalesce(F.col("d._dn"), F.lit(0))
        ).alias("n"),
        n_vals.alias("n_vals"),
        F.when(n_vals > 0, raw_total).alias("total"),
    )
    return merged.where(F.col("n") > 0)
