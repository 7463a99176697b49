"""Registry-wide physical-plan hygiene: no registered batch query may plan
a CartesianProduct (a non-broadcast all-pairs product — the plan shape
that cannot survive 100 TB). BroadcastNestedLoopJoin is allowed: every
occurrence in this registry is a deliberately broadcast tiny side
(single-row aggregates, threshold scalars, 10-20-row probe sets), which
is the correct pattern for scalar enrichment.

Streaming_live queries are excluded: building their result EXECUTES the
stream (their plan shape is covered by tests/test_streaming.py and the
batch twins here)."""

from __future__ import annotations

from pucminas_data_pipelines_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_no_cartesian_product_in_any_registered_plan(spark):
    offenders = {}
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = True
    assert not offenders, f"CartesianProduct in: {sorted(offenders)}"
