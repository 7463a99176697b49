"""Isolated per-query profiler (guide §1): fresh bench-shaped session,
warmup pass, then N timed attempts with per-attempt /proc/stat steal
deltas and the Spark JOB COUNT the attempt submitted (statusTracker job
ids under a per-attempt job group) — job count is the scheduler-barrier
signal the sf0.1 timings are dominated by.

Usage: python scripts/profile_query.py <query> [attempts=5] [--noop]
  --noop times a noop-sink write of the result instead of count()
         (guide §1.4) so column pruning cannot hide work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pucminas_data_pipelines_spark.plans import QUERIES
from pucminas_data_pipelines_spark.session import get_spark


def steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    name = sys.argv[1]
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 5
    use_noop = "--noop" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"profile-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "8g")},
    )
    sc = spark.sparkContext
    fn = QUERIES[name]

    def run() -> None:
        df = fn(spark, sf_dir)
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    # warmup (codegen, footer cache) — 2 passes like the bench context
    for _ in range(2):
        run()
    spark.catalog.clearCache()

    print(f"query={name} attempts={attempts} mode={'noop' if use_noop else 'count'}")
    best = None
    for i in range(attempts):
        group = f"prof-{name}-{i}"
        sc.setJobGroup(group, name)
        s0 = steal()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        ds = steal() - s0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(None, None)
        print(f"  attempt {i}: {dt:.3f}s steal={ds:.1f}s jobs={jobs}")
        if best is None or dt < best:
            best = dt
    print(f"best={best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
