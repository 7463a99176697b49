"""Per-phase wall-time attribution for the mutation scenario queries
(guide §1: measure before changing the commit machinery). Wraps the
ManifestVersionedTable methods (and the incremental-maintenance helpers)
with cumulative timers, runs the query warm, and prints seconds per
phase. Nested phases double-count by design (merge ⊃ stage_merge ⊃
_write_buckets) — read the tree, not the sum.

Usage: python scripts/profile_mutation_phases.py <query> [runs=1]
"""

from __future__ import annotations

import functools
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pucminas_data_pipelines_spark.plans import QUERIES
from pucminas_data_pipelines_spark.session import get_spark

TIMES: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)
PER_CALL: dict[str, list] = defaultdict(list)


def _wrap(obj, name: str, label: str) -> None:
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def timed(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            TIMES[label] += dt
            CALLS[label] += 1
            PER_CALL[label].append(dt)

    setattr(obj, name, timed)


def main() -> None:
    qname = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"phases-{qname}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        extra_conf={"spark.driver.memory": "8g"},
    )

    from pucminas_data_pipelines_spark.operators import incremental as inc
    from pucminas_data_pipelines_spark.operators import upsert as up

    mvt = up.ManifestVersionedTable
    for m in [
        "overwrite",
        "append",
        "optimize",
        "stage_optimize",
        "delete_where",
        "stage_delete_where",
        "merge",
        "stage_merge",
        "commit_staged",
        "_write_buckets",
        "_harvest_stats",
        "_commit_manifest",
        "_manifest",
        "read",
        "read_where",
        "latest_version",
        "_read_dirs",
    ]:
        _wrap(mvt, m, f"mvt.{m}")
    for m in [
        "rollup_from_scratch",
        "apply_rollup_delta",
        "rollup_minmax_from_scratch",
        "apply_rollup_minmax_delta",
    ]:
        _wrap(inc, m, f"inc.{m}")
    _wrap(up, "version_diff", "up.version_diff")
    # plans/mutation.py imports version_diff at module import time —
    # rebind its reference too so the wrapper is what queries call
    import pucminas_data_pipelines_spark.plans.mutation as pm

    if hasattr(pm, "version_diff"):
        pm.version_diff = up.version_diff

    fn = QUERIES[qname]
    # warmup (codegen, footer cache), untimed
    for _ in range(2):
        fn(spark, sf_dir).count()
    TIMES.clear()
    CALLS.clear()
    PER_CALL.clear()

    for i in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        print(f"run {i}: total {time.perf_counter() - t0:.3f}s")

    for label, sec in sorted(TIMES.items(), key=lambda kv: -kv[1]):
        per = " ".join(f"{d:.2f}" for d in PER_CALL.get(label, [])[:16])
        print(f"  {sec / runs:7.3f}s  x{CALLS[label] / runs:<4.0f} {label}  [{per}]")
    spark.stop()


if __name__ == "__main__":
    main()
