"""Registry-wide plan hygiene — the two shapes that cannot survive
100 TB:

1. CartesianProduct (a non-broadcast all-pairs product).
   BroadcastNestedLoopJoin is allowed: every occurrence in this registry
   is a deliberately broadcast tiny side (single-row aggregates,
   threshold scalars, 10-20-row probe sets), which is the correct
   pattern for scalar enrichment.

2. An unpartitioned Window over data-grain input. Spark's WindowExec
   routes the ENTIRE input through one task when the partition spec is
   empty (it is NOT range-parallel, unlike a global orderBy), so a
   global window over an unbounded-grain table is a single-task job at
   scale. Allowed exceptions:
   - windows ordered by the reserved ``_rb`` bucket column — the base-
     offset stitch inside operators/ordered.py's two-pass scheme, whose
     input is the per-bucket partials table (cardinality bounded by the
     bucket COUNT, a config constant, not by data);
   - windows whose direct input chain contains a GlobalLimit — a
     LITERAL bound on the window's input (e.g. text_zipf_exponent's
     rank over the TakeOrdered top-500);
   - the explicit allowlist below: inputs whose grain is bounded by a
     dimension (days of history, number of sources) or a documented
     single-partition demo.

Streaming_live queries are excluded: building their result EXECUTES the
stream (their plan shape is covered by tests/test_streaming.py and the
batch twins here)."""

from __future__ import annotations

from pucminas_data_pipelines_spark.plans import QUERIES
from tests.conftest import SF_SMOKE

# Unpartitioned windows whose input grain is provably tiny (see each
# query's docstring), or a documented demo of the raw SQL shape.
ALLOWED_UNPARTITIONED_WINDOW = {
    "window_ntile",  # documented single-partition NTILE demo (plans/windows.py)
    "stats_cusum_changepoint",  # day-grain error series (time-bounded)
    "curation_token_budget_fill",  # source-grain (tens of rows)
    "curation_temperature_mixture",  # source-grain share normalization
    "curation_epoch_repeat_plan",  # source-grain plan math
    # hypothesis-family grain: the BH rank window orders the m = 25
    # (segment x nation-bucket) p-values — a test-design constant, not
    # data grain (plans/stats.py stats_bh_fdr_correction docstring)
    "stats_bh_fdr_correction",
}


def _limit_bounded(node) -> bool:
    """True if the Window's direct input chain (through unary nodes)
    hits a GlobalLimit — a literal bound on the window's cardinality."""
    cur = node.children().apply(0)
    while True:
        name = cur.getClass().getSimpleName()
        if name in ("GlobalLimit", "LocalLimit"):
            return True
        if cur.children().size() != 1:
            return False
        cur = cur.children().apply(0)


def unpartitioned_window_orders(df) -> list[list[str]]:
    """For each unpartitioned, non-limit-bounded Window node in ``df``'s
    optimized logical plan, the stringified order-key expressions (empty
    list for a Window.partitionBy() frame with no order). Walks children
    only — windows inside scalar subquery expressions are out of scope
    (none registered)."""
    out: list[list[str]] = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().size() == 0 and not _limit_bounded(node):
                order = node.orderSpec()
                out.append(
                    [
                        order.apply(i).child().toString()
                        for i in range(order.size())
                    ]
                )
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return out


def test_plan_hygiene_registry_wide(spark):
    cartesian = {}
    global_windows = {}
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            cartesian[name] = True
        bad = [
            names
            for names in unpartitioned_window_orders(df)
            if not any("_rb" in n for n in names)
        ]
        if bad and name not in ALLOWED_UNPARTITIONED_WINDOW:
            global_windows[name] = bad
    assert not cartesian, f"CartesianProduct in: {sorted(cartesian)}"
    assert not global_windows, (
        "unpartitioned data-grain Window in: "
        f"{ {k: v for k, v in sorted(global_windows.items())} }"
    )
