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


def rollup_minmax_from_scratch(
    base: DataFrame, group_cols: list[str], val_col: str
) -> DataFrame:
    """Batch definition of the MIN/MAX-maintained view: per-group row
    count, non-NULL value count, and the value extrema (min/max ignore
    NULLs, SQL semantics)."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(val_col)).alias("n_vals"),
        F.min(val_col).alias("vmin"),
        F.max(val_col).alias("vmax"),
    )


def apply_rollup_minmax_delta(
    rollup: DataFrame,
    diff: DataFrame,
    group_cols: list[str],
    val_col: str,
    rescan,
    base: DataFrame | None = None,
    max_targeted_groups: int = 10_000,
):
    """MIN/MAX incremental maintenance with TARGETED group rescan — the
    standard escape for the one aggregate family that is not
    self-maintainable under deletes (a retracted extremum says nothing
    about the runner-up). Maintenance is optimistic:

    - inserts only: new_max = greatest(old_max, inserted_max) — O(1)
      per group, never touches the base;
    - a retraction at or beyond the stored extremum that no same-batch
      insert covers makes the group's extremum UNKNOWN → the group is
      marked for rescan;
    - ONLY marked groups are re-read through ``rescan(groups)`` — a
      caller-supplied callable from the affected group-key tuples to
      their CURRENT base rows. On a ManifestVersionedTable the caller
      backs it with the stats-pruned ``read_where`` over a
      group-clustered layout (or ``read_keys`` when the table is keyed
      on the group), so a delete-the-maximum refresh costs the affected
      groups' FILES, never a base-table scan. The change set itself
      comes from version_diff's manifest fast path (changed buckets
      only), so the whole refresh is O(changes + affected groups'
      bytes).

    The targeted path materializes the marked group tuples on the
    DRIVER (``rescan`` takes a Python list) — fine at changed-groups
    grain, hostile at mass-retraction grain (a delete that retracts
    EVERY group's extremum would collect millions of tuples). Above
    ``max_targeted_groups`` marked groups the refresh therefore
    switches to a JOIN-PUSHED rescan (VERDICT r11 #4): the marked-group
    set stays a DataFrame, ``base`` (the caller's current base
    DataFrame, e.g. a stats-pruned or full table read) is left-semi
    joined against it and re-aggregated — no driver list at any size.
    ``base`` is required only when the cap can trip; omitted, an
    over-cap batch raises rather than silently collecting.

    Returns ``(refreshed, affected_groups)``: the maintained rollup
    (bit-equal to rollup_minmax_from_scratch on the post-change base —
    min/max move exact values, no float accumulation) and the list of
    group tuples that required a rescan — or, on the join-pushed path,
    the marked-group COUNT (int), so callers can still assert how
    targeted the refresh was without resurrecting the driver list."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    ins_val = F.when(sign > 0, F.col(val_col))
    ret_val = F.when(sign < 0, F.col(val_col))
    delta = diff.groupBy(*group_cols).agg(
        F.sum(sign).alias("_dn"),
        F.sum(
            F.when(F.col(val_col).isNotNull(), sign).otherwise(F.lit(0))
        ).alias("_dnv"),
        F.max(ins_val).alias("_ins_max"),
        F.min(ins_val).alias("_ins_min"),
        F.max(ret_val).alias("_ret_max"),
        F.min(ret_val).alias("_ret_min"),
    )
    r = rollup.alias("r")
    d = delta.alias("d")
    cond = None
    for c in group_cols:
        eq = F.col(f"r.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = eq if cond is None else (cond & eq)
    n_vals = F.coalesce(F.col("r.n_vals"), F.lit(0)) + F.coalesce(
        F.col("d._dnv"), F.lit(0)
    )
    # optimistic extremum + rescan flag, max side (min mirrors it):
    #   no stored max (new group / all-NULL so far) -> inserted max;
    #   inserted max >= stored max -> inserted max covers any retraction;
    #   retraction at the stored max, uncovered -> UNKNOWN (rescan);
    #   otherwise the stored extremum stands.
    opt_max = (
        F.when(F.col("r.vmax").isNull(), F.col("d._ins_max"))
        .when(
            F.col("d._ins_max") >= F.col("r.vmax"), F.col("d._ins_max")
        )
        .otherwise(F.col("r.vmax"))
    )
    opt_min = (
        F.when(F.col("r.vmin").isNull(), F.col("d._ins_min"))
        .when(
            F.col("d._ins_min") <= F.col("r.vmin"), F.col("d._ins_min")
        )
        .otherwise(F.col("r.vmin"))
    )
    stale_max = (
        F.col("r.vmax").isNotNull()
        & (F.col("d._ret_max") >= F.col("r.vmax"))
        & ~F.coalesce(F.col("d._ins_max") >= F.col("r.vmax"), F.lit(False))
    )
    stale_min = (
        F.col("r.vmin").isNotNull()
        & (F.col("d._ret_min") <= F.col("r.vmin"))
        & ~F.coalesce(F.col("d._ins_min") <= F.col("r.vmin"), F.lit(False))
    )
    needs = (
        F.coalesce(stale_max | stale_min, F.lit(False)) & (n_vals > 0)
    ).alias("_rescan")
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
        F.when(n_vals > 0, opt_min).alias("vmin"),
        F.when(n_vals > 0, opt_max).alias("vmax"),
        needs,
    ).where(F.col("n") > 0)
    merged = merged.localCheckpoint(eager=True)  # group-sized view state
    clean = merged.where(~F.col("_rescan")).drop("_rescan")
    marked = merged.where("_rescan")
    # ONE bounded probe over the checkpointed view state replaces the
    # old unconditional count()-then-collect() pair (VERDICT r12 #5):
    # limit(cap+1) both answers "zero marked? under the cap?" and, when
    # under, IS the driver list — the common zero-marked maintenance
    # call pays a single early-exiting job, and the exact count is only
    # computed on the rare mass-rescan path (for the receipt/raise).
    probe = marked.select(*group_cols).limit(max_targeted_groups + 1).collect()
    if not probe:
        return clean, []
    m = marked.alias("m")
    if len(probe) > max_targeted_groups:
        n_marked = marked.count()  # exact, paid only past the cap
        if base is None:
            raise ValueError(
                f"{n_marked} groups need a rescan (> max_targeted_groups="
                f"{max_targeted_groups}) and no `base` DataFrame was "
                "given for the join-pushed path; pass base= or raise "
                "the cap explicitly"
            )
        # join-pushed mass rescan: the marked-group set never leaves
        # the cluster — semi-join the base down to the affected groups
        # and re-aggregate (one shuffle at affected-groups grain)
        gcond = None
        for c in group_cols:
            eq = F.col(f"b.{c}").eqNullSafe(F.col(f"g.{c}"))
            gcond = eq if gcond is None else (gcond & eq)
        fixed = (
            base.alias("b")
            .join(marked.select(*group_cols).alias("g"), gcond, "left_semi")
            .groupBy(*group_cols)
            .agg(
                F.min(val_col).alias("_fmin"), F.max(val_col).alias("_fmax")
            )
        )
        affected: list | int = n_marked
        fx = fixed.alias("fx")  # affected-groups-sized: no broadcast hint
        join_fx = fx
    else:
        affected = [tuple(row[c] for c in group_cols) for row in probe]
        fixed = (
            rescan(affected)
            .groupBy(*group_cols)
            .agg(
                F.min(val_col).alias("_fmin"), F.max(val_col).alias("_fmax")
            )
        )
        join_fx = F.broadcast(fixed.alias("fx"))
    fcond = None
    for c in group_cols:
        eq = F.col(f"m.{c}").eqNullSafe(F.col(f"fx.{c}"))
        fcond = eq if fcond is None else (fcond & eq)
    repaired = m.join(join_fx, fcond, "left").select(
        *[F.col(f"m.{c}").alias(c) for c in group_cols],
        F.col("m.n").alias("n"),
        F.col("m.n_vals").alias("n_vals"),
        F.col("fx._fmin").alias("vmin"),
        F.col("fx._fmax").alias("vmax"),
    )
    return clean.unionByName(repaired), affected
